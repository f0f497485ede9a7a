"""Hierarchical NVAE autoencoder (reference NVAE/model.py in
SerezD/gen_adversarial), re-designed as a Flax module in NHWC.

Structure (model.py:97-315): preprocessing blocks -> encoder tower
(scales x groups x cells) -> encoder_0 -> per-group enc/dec samplers (+
optional autoregressive NF cells) -> decoder tower from a learned constant
prior -> postprocessing -> DiscMixLogistic head.  The reference's
string-keyed get_submodule loops (model.py:449-571) become statically
unrolled functional towers; every sampling site takes an explicit PRNG key.

The defense op lives in `purify` (mirroring ours/models.py:160-274): at
every latent group, z = (1-alpha_i) * mu_posterior + alpha_i *
prior.sample(temp), with NF applied post-interpolation and the decode taken
as the DiscMixLogistic mean.
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from gen_adversarial_tpu.models.nvae.cells import (
    ResidualCellEncoder, ResidualCellDecoder, EncCombinerCell, DecCombinerCell,
    NFBlock, Conv1x1)
from gen_adversarial_tpu.models.nvae.distributions import Normal, DiscMixLogistic


@dataclass(frozen=True)
class NVAEConfig:
    """Mirrors the reference's ae_args dict (model.py:26-59)."""
    resolution: int = 64
    img_channels: int = 3
    initial_channels: int = 32
    n_pre_post_blocks: int = 1      # 'num_pre-post_process_blocks'
    n_pre_post_cells: int = 2       # 'num_pre-post_process_cells'
    num_mixtures: int = 10          # 'num_logistic_mixtures'
    num_scales: int = 3
    min_groups_per_scale: int = 4   # 'min_groups_per_scale'
    num_groups_per_scale: int = 16  # 'num_groups_per_scale'
    is_adaptive: bool = True
    num_cells_per_group: int = 2
    num_latent_per_group: int = 20
    num_nf_cells: int | None = None
    use_se: bool = True

    @classmethod
    def from_reference_dict(cls, ae_args: dict, resolution: tuple) -> "NVAEConfig":
        """Build from the dict stored inside reference NVAE checkpoints
        (loading_utils.py:57-66)."""
        return cls(
            resolution=resolution[1], img_channels=resolution[0],
            initial_channels=ae_args["initial_channels"],
            n_pre_post_blocks=ae_args["num_pre-post_process_blocks"],
            n_pre_post_cells=ae_args["num_pre-post_process_cells"],
            num_mixtures=ae_args["num_logistic_mixtures"],
            num_scales=ae_args["num_scales"],
            min_groups_per_scale=ae_args["min_groups_per_scale"],
            num_groups_per_scale=ae_args["num_groups_per_scale"],
            is_adaptive=ae_args["is_adaptive"],
            num_cells_per_group=ae_args["num_cells_per_group"],
            num_latent_per_group=ae_args["num_latent_per_group"],
            num_nf_cells=ae_args["num_nf_cells"],
        )

    @property
    def groups_per_scale(self) -> list:
        g = [max(self.min_groups_per_scale, self.num_groups_per_scale // (2 ** i))
             if self.is_adaptive else self.num_groups_per_scale
             for i in range(self.num_scales)]
        g.reverse()
        return g

    @property
    def scaling_factor(self) -> int:
        return 2 ** (self.n_pre_post_blocks + self.num_scales - 1)

    @property
    def n_latents(self) -> int:
        return sum(self.groups_per_scale)

    def kl_alpha(self) -> np.ndarray:
        """Per-group KL weights, normalized to min 1 (model.py:62-66)."""
        parts = [(2 ** i) ** 2 / self.groups_per_scale[self.num_scales - i - 1]
                 * np.ones(self.groups_per_scale[self.num_scales - i - 1])
                 for i in range(self.num_scales)]
        kl = np.concatenate(parts)
        return kl / kl.min()


class NVAE(nn.Module):
    cfg: NVAEConfig

    def setup(self):
        cfg = self.cfg
        base = cfg.initial_channels
        gps = cfg.groups_per_scale

        # channel schedule (the reference tracks this with a running
        # ch_multiplier across _init_* calls, model.py:97-315)
        pre_out_mult = 2 ** cfg.n_pre_post_blocks
        enc_mult = {s: pre_out_mult * 2 ** (cfg.num_scales - 1 - s)
                    for s in range(cfg.num_scales)}
        top_mult = pre_out_mult * 2 ** (cfg.num_scales - 1)

        # ---- preprocessing
        self.init_conv = nn.Conv(base, (3, 3), padding=1, name="init_conv")
        pre = {}
        mult = 1
        for b in range(cfg.n_pre_post_blocks):
            for c in range(cfg.n_pre_post_cells):
                last = c == cfg.n_pre_post_cells - 1
                ch = base * mult
                pre[f"{b}_{c}"] = ResidualCellEncoder(
                    ch * 2 if last else ch, downsampling=last, use_se=cfg.use_se)
                if last:
                    mult *= 2
        self.pre_cells = pre

        # ---- encoder tower
        enc, enc_comb = {}, {}
        for s in range(cfg.num_scales - 1, -1, -1):
            ch = base * enc_mult[s]
            for g in range(gps[s] - 1, -1, -1):
                for c in range(cfg.num_cells_per_group):
                    enc[f"{s}_{g}_{c}"] = ResidualCellEncoder(
                        ch, downsampling=False, use_se=cfg.use_se)
                if not (s == 0 and g == 0):
                    enc_comb[f"{s}_{g}"] = EncCombinerCell(ch)
            if s > 0:
                enc[f"{s}_down"] = ResidualCellEncoder(
                    ch * 2, downsampling=True, use_se=cfg.use_se)
        self.enc_cells = enc
        self.enc_combiners = enc_comb
        self.encoder_0_conv = Conv1x1(base * top_mult, name="encoder_0_conv")

        # ---- samplers (+ NF)
        enc_sampler, dec_sampler, nf = {}, {}, {}
        for s in range(cfg.num_scales):
            ch = base * top_mult // (2 ** s)
            for g in range(gps[s]):
                enc_sampler[f"{s}_{g}"] = nn.Conv(
                    2 * cfg.num_latent_per_group, (3, 3), padding=1)
                if cfg.num_nf_cells is not None:
                    nf[f"{s}_{g}"] = [NFBlock(cfg.num_latent_per_group)
                                      for _ in range(cfg.num_nf_cells)]
                if not (s == 0 and g == 0):
                    dec_sampler[f"{s}_{g}"] = Conv1x1(
                        2 * cfg.num_latent_per_group)
        self.enc_sampler = enc_sampler
        self.dec_sampler = dec_sampler
        self.nf_cells = nf

        # ---- decoder tower
        dec, dec_comb = {}, {}
        for s in range(cfg.num_scales):
            ch = base * top_mult // (2 ** s)
            for g in range(gps[s]):
                if not (s == 0 and g == 0):
                    for c in range(cfg.num_cells_per_group):
                        dec[f"{s}_{g}_{c}"] = ResidualCellDecoder(
                            ch, ch, upsampling=False, use_se=cfg.use_se)
                dec_comb[f"{s}_{g}"] = DecCombinerCell(ch)
            if s < cfg.num_scales - 1:
                dec[f"{s}_up"] = ResidualCellDecoder(
                    ch, ch // 2, upsampling=True, use_se=cfg.use_se)
        self.dec_cells = dec
        self.dec_combiners = dec_comb

        # ---- postprocessing
        post = {}
        mult = pre_out_mult
        for b in range(cfg.n_pre_post_blocks):
            for c in range(cfg.n_pre_post_cells):
                first = c == 0
                ch = base * mult
                post[f"{b}_{c}"] = ResidualCellDecoder(
                    ch, ch // 2 if first else ch, upsampling=first,
                    use_se=cfg.use_se, hidden_mul=3)
                if first:
                    mult //= 2
        self.post_cells = post

        out_ch = cfg.num_mixtures * (1 + 3 * cfg.img_channels)
        self.to_logits_conv = nn.Conv(out_ch, (3, 3), padding=1, name="to_logits_conv")

        r = cfg.resolution // cfg.scaling_factor
        self.const_prior = self.param(
            "const_prior", lambda k, shape: jax.random.uniform(k, shape),
            (1, r, r, base * top_mult))

    # ------------------------------------------------------------------ helpers
    def _preprocess(self, x, train):
        # images in [0,1] -> normalize to [-1,1] (model.py:459)
        x = (x - 0.5) / 0.5
        x = self.init_conv(x)
        for b in range(self.cfg.n_pre_post_blocks):
            for c in range(self.cfg.n_pre_post_cells):
                x = self.pre_cells[f"{b}_{c}"](x, train)
        return x

    def _encode_tower(self, x, train):
        cfg = self.cfg
        feats = {}
        for s in range(cfg.num_scales - 1, -1, -1):
            for g in range(cfg.groups_per_scale[s]):
                for c in range(cfg.num_cells_per_group):
                    x = self.enc_cells[f"{s}_{g}_{c}"](x, train)
                if not (s == 0 and g == 0):
                    feats[f"{s}_{g}"] = x
            if s > 0:
                x = self.enc_cells[f"{s}_down"](x, train)
        x = nn.elu(x)
        x = self.encoder_0_conv(x)
        x = nn.elu(x)
        return feats, x

    def _apply_nf(self, s, g, z):
        if self.cfg.num_nf_cells is not None:
            for block in self.nf_cells[f"{s}_{g}"]:
                z = block(z)
        return z

    def _postprocess_to_logits(self, x, train):
        for b in range(self.cfg.n_pre_post_blocks):
            for c in range(self.cfg.n_pre_post_cells):
                x = self.post_cells[f"{b}_{c}"](x, train)
        x = nn.elu(x)
        return self.to_logits_conv(x)

    def _decode_groups(self, b, z_0, group_fn, train):
        """Shared decoder loop.  group_fn(s, g, x, latent_idx) -> z_i for
        every group except (0,0); z_0 is injected at the start."""
        cfg = self.cfg
        x = jnp.broadcast_to(self.const_prior,
                             (b,) + self.const_prior.shape[1:])
        x = self.dec_combiners["0_0"](x, z_0)
        latent_idx = 1
        for s in range(cfg.num_scales):
            for g in range(cfg.groups_per_scale[s]):
                if not (s == 0 and g == 0):
                    for c in range(cfg.num_cells_per_group):
                        x = self.dec_cells[f"{s}_{g}_{c}"](x, train)
                    z_i = group_fn(s, g, x, latent_idx)
                    x = self.dec_combiners[f"{s}_{g}"](x, z_i)
                    latent_idx += 1
            if s < cfg.num_scales - 1:
                x = self.dec_cells[f"{s}_up"](x, train)
        return x

    # ------------------------------------------------------------------ API
    def __call__(self, x, key, train: bool = False):
        """Training forward: (logits, kl_losses (B, n_latents))
        (model.py:449-571)."""
        cfg = self.cfg
        b = x.shape[0]
        keys = iter(jax.random.split(key, cfg.n_latents + 1))

        feats, top = self._encode_tower(self._preprocess(x, train), train)

        mu_q, log_sig_q = jnp.split(self.enc_sampler["0_0"](top), 2, axis=-1)
        dist_enc = Normal(mu_q, log_sig_q)
        z_0, _ = dist_enc.sample(next(keys))
        dist_dec = Normal(jnp.zeros_like(mu_q), jnp.zeros_like(log_sig_q))
        if cfg.num_nf_cells is not None:
            log_enc = dist_enc.log_p(z_0)
            z_0 = self._apply_nf(0, 0, z_0)
            kl_0 = log_enc - dist_dec.log_p(z_0)
        else:
            kl_0 = dist_enc.kl(dist_dec)
        kls = [jnp.sum(kl_0, axis=(1, 2, 3))]

        def group_fn(s, g, x, latent_idx):
            mu_p, log_sig_p = jnp.split(self.dec_sampler[f"{s}_{g}"](nn.elu(x)), 2, axis=-1)
            comb = self.enc_combiners[f"{s}_{g}"](feats[f"{s}_{g}"], x)
            mu_q, log_sig_q = jnp.split(self.enc_sampler[f"{s}_{g}"](comb), 2, axis=-1)
            dist_enc = Normal(mu_p + mu_q, log_sig_p + log_sig_q)
            z_i, _ = dist_enc.sample(next(keys))
            dist_dec = Normal(mu_p, log_sig_p)
            if cfg.num_nf_cells is not None:
                log_enc = dist_enc.log_p(z_i)
                z_i = self._apply_nf(s, g, z_i)
                kl_i = log_enc - dist_dec.log_p(z_i)
            else:
                kl_i = dist_enc.kl(dist_dec)
            kls.append(jnp.sum(kl_i, axis=(1, 2, 3)))
            return z_i

        x = self._decode_groups(b, z_0, group_fn, train)
        logits = self._postprocess_to_logits(x, train)
        return logits, jnp.stack(kls, axis=1)

    def reconstruction_loss(self, x, logits):
        """-log p(x | logits) per sample (model.py:573-577)."""
        normalized = (x - 0.5) / 0.5
        lp = DiscMixLogistic(logits).log_prob(normalized)
        return -jnp.sum(lp, axis=(1, 2))

    def sample(self, key, num_samples: int, temperature: float = 1.0,
               train: bool = False, dtype=jnp.float32):
        """Prior sampling (model.py:579-629); returns images in [0,1].
        `dtype`: prior-draw dtype — pass jnp.bfloat16 when the variables are
        bf16-cast (core/precision), else the first conv rejects mixed dtypes."""
        cfg = self.cfg
        keys = iter(jax.random.split(key, cfg.n_latents + 2))
        r = cfg.resolution // cfg.scaling_factor
        shape = (num_samples, r, r, cfg.num_latent_per_group)
        dist = Normal(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype),
                      temp=temperature)
        z_0, _ = dist.sample(next(keys))

        def group_fn(s, g, x, latent_idx):
            mu_p, log_sig_p = jnp.split(self.dec_sampler[f"{s}_{g}"](nn.elu(x)), 2, axis=-1)
            z_i, _ = Normal(mu_p, log_sig_p, temp=temperature).sample(next(keys))
            return z_i

        x = self._decode_groups(num_samples, z_0, group_fn, train)
        logits = self._postprocess_to_logits(x, train)
        out = DiscMixLogistic(logits).sample(next(keys))
        return out * 0.5 + 0.5

    def reconstruct(self, x, key, deterministic: bool = False,
                    train: bool = False):
        """Posterior (mean or sampled) reconstruction (model.py:631-736)."""
        cfg = self.cfg
        b = x.shape[0]
        keys = iter(jax.random.split(key, cfg.n_latents + 2))
        feats, top = self._encode_tower(self._preprocess(x, train), train)

        mu_q, log_sig_q = jnp.split(self.enc_sampler["0_0"](top), 2, axis=-1)
        dist_enc = Normal(mu_q, log_sig_q)
        z_0 = dist_enc.mu if deterministic else dist_enc.sample(next(keys))[0]
        z_0 = self._apply_nf(0, 0, z_0)

        def group_fn(s, g, x, latent_idx):
            mu_p, log_sig_p = jnp.split(self.dec_sampler[f"{s}_{g}"](nn.elu(x)), 2, axis=-1)
            comb = self.enc_combiners[f"{s}_{g}"](feats[f"{s}_{g}"], x)
            mu_q, log_sig_q = jnp.split(self.enc_sampler[f"{s}_{g}"](comb), 2, axis=-1)
            dist_enc = Normal(mu_p + mu_q, log_sig_p + log_sig_q)
            z_i = dist_enc.mu if deterministic else dist_enc.sample(next(keys))[0]
            return self._apply_nf(s, g, z_i)

        x = self._decode_groups(b, z_0, group_fn, train)
        logits = self._postprocess_to_logits(x, train)
        dm = DiscMixLogistic(logits)
        out = dm.mean() if deterministic else dm.sample(next(keys))
        return out * 0.5 + 0.5

    def purify_encode(self, x, train: bool = False):
        """Deterministic half of `purify`: preprocess + the full encoder
        tower.  Split out so EoT wrappers can run it ONCE per image and
        share the result across all stochastic draws (the reference
        recomputes it per EoT repeat, wrappers.py:14-16 — the encoder
        consumes no randomness, so sharing is result-identical)."""
        return self._encode_tower(self._preprocess(x, train), train)

    def purify(self, x, key, alphas, temperature: float = 0.6,
               train: bool = False):
        """THE defense op (ours/models.py:160-274): per-group interpolation
        between the posterior mean and a fresh prior sample.

        alphas: (n_latents,) array (attenuation pre-applied by the caller,
        abstract_models.py:107).  Returns images in [0,1] via the
        DiscMixLogistic mean.
        """
        return self.purify_decode(self.purify_encode(x, train), key, alphas,
                                  temperature, train)

    def purify_decode(self, state, key, alphas, temperature: float = 0.6,
                      train: bool = False):
        """Stochastic half of `purify`: per-group interpolation + decode,
        consuming the shared `state = purify_encode(x)`."""
        cfg = self.cfg
        feats, top = state
        b = top.shape[0]
        alphas = jnp.asarray(alphas)
        keys = iter(jax.random.split(key, cfg.n_latents + 1))

        mu_q, log_sig_q = jnp.split(self.enc_sampler["0_0"](top), 2, axis=-1)
        dist_enc = Normal(mu_q, log_sig_q)
        dist_dec = Normal(jnp.zeros_like(mu_q), jnp.zeros_like(log_sig_q),
                          temp=temperature)
        z_0 = (1 - alphas[0]) * dist_enc.mu + alphas[0] * dist_dec.sample(next(keys))[0]
        z_0 = self._apply_nf(0, 0, z_0)

        def group_fn(s, g, x, latent_idx):
            comb = self.enc_combiners[f"{s}_{g}"](feats[f"{s}_{g}"], x)
            mu_q, log_sig_q = jnp.split(self.enc_sampler[f"{s}_{g}"](comb), 2, axis=-1)
            mu_p, log_sig_p = jnp.split(self.dec_sampler[f"{s}_{g}"](nn.elu(x)), 2, axis=-1)
            dist_enc = Normal(mu_p + mu_q, log_sig_p + log_sig_q)
            dist_dec = Normal(mu_p, log_sig_p, temp=temperature)
            a = alphas[latent_idx]
            z_i = (1 - a) * dist_enc.mu + a * dist_dec.sample(next(keys))[0]
            return self._apply_nf(s, g, z_i)

        x = self._decode_groups(b, z_0, group_fn, train)
        logits = self._postprocess_to_logits(x, train)
        out = DiscMixLogistic(logits).mean()
        return out * 0.5 + 0.5
