"""ND-VAE competitor: simplified-NVAE denoising VAE trained on
(adversarial -> clean) pairs (reference
src/defenses/competitors/nd_vae/modules/models/NVAE.py in
SerezD/gen_adversarial), Flax / NHWC.

Notes vs the reference:
- Its Normal adds 1e-2 to sigma after the soft clamp (NVAE.py:95), unlike
  the main NVAE's distribution - reproduced here.
- CustomSwish (NVAE.py:32-47) exists upstream only as a memory-saving
  autograd trick; jax.nn.swish differentiates identically, and remat is the
  TPU-native answer to the memory concern.
- The per-scale Sampler stores distributions as module state upstream
  (NVAE.py:607-635); here it returns them functionally.
"""

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
from flax import linen as nn

from gen_adversarial_tpu.models.nvae.distributions import (
    soft_clamp, DiscMixLogistic)
from gen_adversarial_tpu.ops.image import resize_bilinear


class NDNormal:
    """NVAE.py:91-114: sigma = exp(soft_clamp(log_sigma)) + 1e-2."""

    def __init__(self, mu, log_sigma, temp: float = 1.0):
        self.mu = soft_clamp(mu)
        self.sigma = jnp.exp(soft_clamp(log_sigma)) + 1e-2
        if temp != 1.0:
            self.sigma = self.sigma * temp

    def sample(self, key):
        eps = jax.random.normal(key, self.mu.shape, self.mu.dtype)
        return self.mu + eps * self.sigma, eps

    def log_p(self, samples):
        z = (samples - self.mu) / self.sigma
        return -0.5 * z * z - 0.5 * math.log(2 * math.pi) - jnp.log(self.sigma)

    def kl(self, other: "NDNormal"):
        t1 = (self.mu - other.mu) / other.sigma
        t2 = self.sigma / other.sigma
        return 0.5 * (t1 * t1 + t2 * t2) - 0.5 - jnp.log(t2)


def _bn(train, name):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, name=name)


class NDSE(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x):
        hidden = max(self.out_channels // 16, 4)
        se = jnp.mean(x, axis=(1, 2))
        se = nn.relu(nn.Dense(hidden, name="fc1")(se))
        se = nn.sigmoid(nn.Dense(self.out_channels, name="fc2")(se))
        return x * se[:, None, None, :]


class FactorizedReduce(nn.Module):
    """NVAE.py:117-135: swish + 4 shifted stride-2 1x1 convs concatenated."""
    out_channels: int

    @nn.compact
    def __call__(self, x):
        c4 = self.out_channels // 4
        out = jax.nn.swish(x)
        conv = lambda ch, name: nn.Conv(ch, (1, 1), strides=(2, 2), name=name)
        y1 = conv(c4, "conv_1")(out)
        y2 = conv(c4, "conv_2")(out[:, 1:, 1:, :])
        y3 = conv(c4, "conv_3")(out[:, :, 1:, :])
        y4 = conv(self.out_channels - 3 * c4, "conv_4")(out[:, 1:, :, :])
        return jnp.concatenate([y1, y2, y3, y4], axis=-1)


class ResidualCell(nn.Module):
    """Residual_Cell_NVAE (NVAE.py:250-288): BN-swish-conv3 x2 + SE."""
    out_channels: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.stride == 1:
            skip = x
        else:
            skip = FactorizedReduce(self.out_channels, name="skip")(x)
        y = _bn(train, "bn1")(x)
        y = jax.nn.swish(y)
        y = nn.Conv(self.out_channels, (3, 3), strides=(self.stride,) * 2,
                    padding=1, name="conv1")(y)
        y = _bn(train, "bn2")(y)
        y = jax.nn.swish(y)
        y = nn.Conv(self.out_channels, (3, 3), padding=1, name="conv2")(y)
        y = NDSE(self.out_channels, name="se")(y)
        return skip + y


class GenerativeCell(nn.Module):
    """Generative_Cell_NVAE (NVAE.py:156-222): MBConv cell, optional
    nearest-upsample with a bilinear-upsampled 1x1 skip."""
    in_channels: int
    e_param: int
    upsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_ch = self.in_channels // 2 if self.upsample else self.in_channels
        expanded = self.in_channels * self.e_param
        if self.upsample:
            b, h, w, c = x.shape
            skip = resize_bilinear(x, h * 2, w * 2, align_corners=True)
            skip = nn.Conv(out_ch, (1, 1), name="skip_conv")(skip)
            y = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        else:
            skip = x
            y = x
        y = _bn(train, "bn1")(y)
        y = nn.Conv(expanded, (1, 1), name="expand")(y)
        y = _bn(train, "bn_expanded1")(y)
        y = jax.nn.swish(y)
        y = nn.Conv(expanded, (5, 5), padding=2, feature_group_count=expanded,
                    name="dw")(y)
        y = nn.Conv(expanded, (1, 1), name="pw")(y)
        y = _bn(train, "bn_expanded2")(y)
        y = jax.nn.swish(y)
        y = nn.Conv(out_ch, (1, 1), name="expand2")(y)
        y = _bn(train, "bn2")(y)
        y = NDSE(out_ch, name="se")(y)
        return skip + y


class Sampler(nn.Module):
    """NVAE.py:592-635: posterior conv + ELU-prior conv; returns
    (z, q_dist, p_dist, log_q, log_p)."""
    channels: int

    @nn.compact
    def __call__(self, x, key):
        prior = nn.Conv(2 * self.channels, (1, 1), name="prior_conv")(nn.elu(x))
        mu_p, log_sig_p = jnp.split(prior, 2, axis=-1)
        post = nn.Conv(2 * self.channels, (3, 3), padding=1, name="cell")(x)
        mu_q, log_sig_q = jnp.split(post, 2, axis=-1)
        q = NDNormal(mu_q + mu_p, log_sig_q + log_sig_p)
        z, _ = q.sample(key)
        log_q = q.log_p(z)
        p = NDNormal(mu_p, log_sig_p)
        log_p = p.log_p(z)
        return z, q, p, log_q, log_p


class DefenceNVAE(nn.Module):
    """Defence_NVAE (NVAE.py:639-734)."""
    x_channels: int = 3
    encoding_channels: int = 16
    pre_proc_groups: int = 2
    scales: int = 2
    groups: int = 2
    cells: int = 4
    input_dim: int = 64
    num_mixtures: int = 10

    def setup(self):
        cfg = self
        ch = cfg.encoding_channels
        self.stem = nn.Conv(ch, (3, 3), padding=1)

        # pre-proc tower: groups x cells; last cell of each group is
        # stride-2 channel-doubling (NVAE.py:305-336)
        pre = []
        cur = ch
        for g in range(cfg.pre_proc_groups):
            for c in range(cfg.cells):
                if c == cfg.cells - 1:
                    pre.append(ResidualCell(cur * 2, stride=2))
                    cur *= 2
                else:
                    pre.append(ResidualCell(cur))
        self.pre_cells = pre
        pre_out = cur

        # encoder tower (NVAE.py:372-442): per scale, groups x cells + a
        # stride-2 doubling cell (except last scale)
        enc = []
        enc_comb_ch = []  # channels for the combiner at each scale (reversed)
        cur = pre_out
        for s in range(cfg.scales):
            scale = []
            for g in range(cfg.groups):
                for c in range(cfg.cells):
                    scale.append(ResidualCell(cur))
            enc_comb_ch.insert(0, cur)
            if s < cfg.scales - 1:
                scale.append(ResidualCell(cur * 2, stride=2))
                cur = cur * 2
            enc.append(scale)
        self.enc_scales = enc
        enc_out = cur

        # encoder combiners: EncCombinerCell conv (decoder feats -> enc ch)
        self.enc_combiners = [nn.Conv(c_, (1, 1)) for c_ in enc_comb_ch]

        # decoder (NVAE.py:470-547).  The upstream encoder_0_cell
        # ('post_encoder') is constructed but never called in forward
        # (NVAE.py:484 vs :557) - omitted here.
        h_scaling = 2 ** (cfg.scales + 1)
        r = max(cfg.input_dim // h_scaling, 4)
        self.h = self.param("h", lambda k, s_: jax.random.uniform(k, s_),
                            (1, r, r, enc_out))

        dec, dec_comb_ch = [], []
        cur = enc_out
        for s in range(cfg.scales):
            scale = []
            for g in range(cfg.groups):
                scale.append(("group", cur))
            dec_comb_ch.append(cur)
            if s != 0:
                scale.append(("up", cur))
                cur = cur // 2
            dec.append(scale)
        dec_comb_ch.append(cur)
        self.dec_plan = dec
        # materialize decoder modules
        groups_mods = []
        for s, scale in enumerate(dec):
            mods = []
            for kind, c_ in scale:
                if kind == "group":
                    mods.append(
                        ([GenerativeCell(c_, 2) for _ in range(cfg.cells)],
                         nn.Conv(c_, (1, 1))))  # group cells + DecCombiner conv
                else:
                    mods.append(GenerativeCell(c_, 2, upsample=True))
            groups_mods.append(mods)
        self.dec_mods = groups_mods
        self.dec_combiners = [nn.Conv(c_, (1, 1)) for c_ in dec_comb_ch]
        self.samplers = [Sampler(c_) for c_ in self._sampler_channels()]

        # post-proc tower (NVAE.py:340-369)
        post = []
        mult = 2 ** cfg.pre_proc_groups
        for b in range(cfg.pre_proc_groups):
            for c in range(cfg.cells):
                channels = cfg.encoding_channels * mult
                if c == 0:
                    post.append(GenerativeCell(channels, 2, upsample=True))
                    mult //= 2
                else:
                    post.append(GenerativeCell(channels, channels))
        self.post_cells = post

        out_ch = int(cfg.num_mixtures + cfg.num_mixtures * 3 * cfg.x_channels)
        self.image_conditional_conv = nn.Conv(out_ch, (3, 3), padding=1)

    def _sampler_channels(self):
        """Sampler channel sizes: scales+1 samplers, top two equal then
        halving (NVAE.py:537-547)."""
        enc_out = self.encoding_channels * (2 ** self.pre_proc_groups) * \
            (2 ** (self.scales - 1))
        chans = [enc_out]
        cur = enc_out
        for s in range(self.scales):
            if s != 0:
                cur = cur // 2
            chans.append(cur)
        return chans

    def __call__(self, x, key, train: bool = False):
        """Returns (mixture logits, log_q, log_p, kl_all list) on [0,1] inputs."""
        cfg = self
        keys = iter(jax.random.split(key, cfg.scales + 2))
        from gen_adversarial_tpu.ops.image import clamp01
        x = clamp01(x) * 2.0 - 1.0  # torch-clamp tie gradient (NVAE.py:699)
        x = self.stem(x)
        for cell in self.pre_cells:
            x = cell(x, train)

        # encoder: collect per-scale outputs, top-down order
        latents = [x]
        for scale in self.enc_scales:
            for cell in scale:
                x = cell(x, train)
            latents.append(x)
        latents = list(reversed(latents))  # top-down

        # decoder (sampler 0 reads the raw top encoding, NVAE.py:557)
        dists = []
        z1, q, p, lq, lp = self.samplers[0](latents[0], next(keys))
        dists.append((q, p, lq, lp))
        b = z1.shape[0]
        h = jnp.broadcast_to(self.h, (b,) + self.h.shape[1:])
        out = self.dec_combiners[0](jnp.concatenate([z1, h], axis=-1))

        for s in range(cfg.scales):
            y = out
            for mod in self.dec_mods[s]:
                if isinstance(mod, tuple):
                    cells, comb = mod
                    yy = y
                    for cell in cells:
                        yy = cell(yy, train)
                    y = comb(jnp.concatenate([y, yy], axis=-1))
                else:
                    y = mod(y, train)
            combined = latents[s + 1] + self.enc_combiners[s](y)
            z, q, p, lq, lp = self.samplers[s + 1](combined, next(keys))
            dists.append((q, p, lq, lp))
            out = self.dec_combiners[s + 1](jnp.concatenate([z, y], axis=-1))

        for cell in self.post_cells:
            out = cell(out, train)
        logits = self.image_conditional_conv(nn.elu(out))

        kl_all, log_q, log_p = [], 0.0, 0.0
        for q, p, lq, lp in dists:
            kl = q.kl(p)
            kl_all.append(jnp.sum(kl, axis=(1, 2, 3)))
            log_q = log_q + jnp.sum(lq, axis=(1, 2, 3))
            log_p = log_p + jnp.sum(lp, axis=(1, 2, 3))
        return logits, log_q, log_p, kl_all

    def purify(self, x, key):
        """The defense decode: mixture mean (nd_vae/purification_model.py:17-25).
        The ND-VAE's own DiscMixLogistic.mean (NVAE_utils.py:224-250) maps
        the autoregressed mean to the [0,1] range with (x+1)/2 - unlike the
        main NVAE's (distributions.py:231-254), which this module reuses -
        so the shift is applied here; the classifier then sees a [0,1]
        image, matching the reference wrapper exactly
        (tests/test_competitors.py::test_ndvae_defense_wrapper_exact)."""
        logits, _, _, _ = self(x, key)
        return (DiscMixLogistic(logits).mean() + 1.0) / 2.0
