"""Scan-over-groups NVAE purify: the compile-time/HLO-size optimized path.

The flax NVAE (models/nvae/model.py) unrolls every latent group at trace
time - faithful, but a 24-group tower unrolls into hundreds of conv ops and
attack graphs (fwd+bwd x EoT x iterations) pay minutes of XLA compile.
Within a scale all groups share shapes, so this module re-expresses the
towers as `jax.lax.scan` over *stacked* per-group parameters: one traced
group body per scale regardless of group count.

It consumes the SAME converted variables as the flax model, restacked once
by `stack_for_scan`, and reproduces NVAE.purify exactly (same PRNG key
order, same math; parity-tested).  Eval-mode only (running BN stats);
normalizing-flow configs fall back to the unrolled model.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from gen_adversarial_tpu.models.nvae.distributions import (
    Normal, DiscMixLogistic)
from gen_adversarial_tpu.models.nvae.model import NVAEConfig


# ----------------------------------------------------------------- functional
def _conv(p, x, stride=1, pad=None, groups=1):
    k = p["kernel"]
    kh = k.shape[0]
    if pad is None:
        pad = kh // 2
    y = lax.conv_general_dilated(
        x, k, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=groups)
    if "bias" in p:
        y = y + p["bias"]
    return y


def _bn(p, s, x, eps=1e-5):
    return (x - s["mean"]) * lax.rsqrt(s["var"] + eps) * p["scale"] + p["bias"]


def _se(p, x):
    se = jnp.mean(x, axis=(1, 2))
    se = jax.nn.relu(se @ p["linear_1"]["kernel"] + p["linear_1"]["bias"])
    se = jax.nn.sigmoid(se @ p["linear_2"]["kernel"] + p["linear_2"]["bias"])
    return x * se[:, None, None, :]


def _enc_cell(p, s, x, downsampling: bool):
    stride = 2 if downsampling else 1
    r = jax.nn.silu(_bn(p["bn0"], s["bn0"], x))
    r = _conv(p["conv0"], r, stride=stride)
    r = jax.nn.silu(_bn(p["bn1"], s["bn1"], r))
    r = _conv(p["conv1"], r)
    if "se" in p:
        r = _se(p["se"], r)
    if downsampling:
        skip = _conv(p["skip"]["conv"], jax.nn.silu(x), stride=2, pad=0)
    else:
        skip = x
    return skip + 0.1 * r


def _dec_cell(p, s, x, upsampling: bool):
    from gen_adversarial_tpu.ops.image import resize_bilinear
    hidden_groups = p["conv_depthwise"]["kernel"].shape[-1]
    if upsampling:
        r = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    else:
        r = x
    r = _bn(p["bn0"], s["bn0"], r)
    r = _conv(p["conv_expand"], r, pad=0)
    r = jax.nn.silu(_bn(p["bn1"], s["bn1"], r))
    r = _conv(p["conv_depthwise"], r, groups=hidden_groups)
    r = jax.nn.silu(_bn(p["bn2"], s["bn2"], r))
    r = _conv(p["conv_project"], r, pad=0)
    r = _bn(p["bn3"], s["bn3"], r)
    if "se" in p:
        r = _se(p["se"], r)
    if upsampling:
        b, h, w, c = x.shape
        skip = resize_bilinear(x, h * 2, w * 2, align_corners=True)
        skip = _conv(p["skip"]["conv"], skip, pad=0)
    else:
        skip = x
    return skip + 0.1 * r


# ------------------------------------------------------------------ stacking
def stack_for_scan(variables: dict, cfg: NVAEConfig) -> dict:
    """Restack flax-NVAE variables into the scan layout: per scale, a pytree
    of per-group parameter stacks with leading axis G (or G-1 for scale 0,
    whose group 0 has no decoder side)."""
    if cfg.num_nf_cells:
        raise NotImplementedError("NF configs use the unrolled NVAE")
    p, s = variables["params"], variables["batch_stats"]
    gps = cfg.groups_per_scale

    def stack(trees):
        return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)

    out = {"params": {}, "stats": {}}
    # shared (non-scanned) pieces pass through
    for k in ("init_conv", "encoder_0_conv", "to_logits_conv", "const_prior",
              "enc_sampler_0_0", "dec_combiners_0_0"):
        out["params"][k] = p[k]
    for b in range(cfg.n_pre_post_blocks):
        for c in range(cfg.n_pre_post_cells):
            out["params"][f"pre_cells_{b}_{c}"] = p[f"pre_cells_{b}_{c}"]
            out["stats"][f"pre_cells_{b}_{c}"] = s[f"pre_cells_{b}_{c}"]
            out["params"][f"post_cells_{b}_{c}"] = p[f"post_cells_{b}_{c}"]
            out["stats"][f"post_cells_{b}_{c}"] = s[f"post_cells_{b}_{c}"]

    for sc in range(cfg.num_scales):
        # encoder groups: all groups of the scale (cells only)
        enc_groups = []
        for g in range(gps[sc]):
            enc_groups.append({
                f"cell_{c}": {"p": p[f"enc_cells_{sc}_{g}_{c}"],
                              "s": s[f"enc_cells_{sc}_{g}_{c}"]}
                for c in range(cfg.num_cells_per_group)})
        out["params"][f"enc_scan_{sc}"] = stack(enc_groups)
        if sc > 0:
            out["params"][f"enc_down_{sc}"] = {
                "p": p[f"enc_cells_{sc}_down"], "s": s[f"enc_cells_{sc}_down"]}

        # decoder groups: skip (0,0)
        dec_groups = []
        for g in range(gps[sc]):
            if sc == 0 and g == 0:
                continue
            dec_groups.append({
                "cells": {f"cell_{c}": {"p": p[f"dec_cells_{sc}_{g}_{c}"],
                                        "s": s[f"dec_cells_{sc}_{g}_{c}"]}
                          for c in range(cfg.num_cells_per_group)},
                "dec_sampler": p[f"dec_sampler_{sc}_{g}"],
                "enc_combiner": p[f"enc_combiners_{sc}_{g}"]["conv"],
                "enc_sampler": p[f"enc_sampler_{sc}_{g}"],
                "dec_combiner": p[f"dec_combiners_{sc}_{g}"]["conv"],
            })
        if dec_groups:
            out["params"][f"dec_scan_{sc}"] = stack(dec_groups)
        if sc < cfg.num_scales - 1:
            out["params"][f"dec_up_{sc}"] = {
                "p": p[f"dec_cells_{sc}_up"], "s": s[f"dec_cells_{sc}_up"]}
    return out


# ------------------------------------------------------------------- purify
def make_scanned_nvae_purify(cfg: NVAEConfig, temperature: float = 0.6):
    """Returns purify_apply(variables, alphas, key, x) with the
    defenses/purify.py signature; `variables` is the stack_for_scan output."""
    gps = cfg.groups_per_scale
    ncell = cfg.num_cells_per_group

    def purify_apply(v, alphas, key, x):
        # The defense path never differentiates w.r.t. model parameters;
        # without this, the lax.scan transpose accumulates full parameter
        # cotangent stacks per attack iteration (50x slower backward).
        v = jax.lax.stop_gradient(v)
        p, st = v["params"], v["stats"]
        alphas = jnp.asarray(alphas)
        keys = jax.random.split(key, cfg.n_latents + 1)

        # ---- preprocessing (unrolled: few cells)
        h = (x - 0.5) / 0.5
        h = _conv(p["init_conv"], h)
        for b in range(cfg.n_pre_post_blocks):
            for c in range(cfg.n_pre_post_cells):
                cell = p[f"pre_cells_{b}_{c}"]
                stats = st[f"pre_cells_{b}_{c}"]
                h = _enc_cell(cell, stats, h, downsampling="skip" in cell)

        # ---- encoder towers: scan groups within each scale
        feats = {}
        for sc in range(cfg.num_scales - 1, -1, -1):
            def enc_body(carry, gp):
                y = carry
                for c in range(ncell):
                    y = _enc_cell(gp[f"cell_{c}"]["p"], gp[f"cell_{c}"]["s"],
                                  y, False)
                return y, y

            h, feat_stack = lax.scan(enc_body, h, p[f"enc_scan_{sc}"])
            feats[sc] = feat_stack  # (G, B, H, W, C)
            if sc > 0:
                d = p[f"enc_down_{sc}"]
                h = _enc_cell(d["p"], d["s"], h, True)

        h = jax.nn.elu(h)
        h = _conv(p["encoder_0_conv"], h, pad=0)
        h = jax.nn.elu(h)

        # ---- z_0 (keys[0]; ours/models.py:197-206)
        mu_q, log_sig_q = jnp.split(_conv(p["enc_sampler_0_0"], h), 2, axis=-1)
        dist_enc = Normal(mu_q, log_sig_q)
        dist_dec = Normal(jnp.zeros_like(mu_q), jnp.zeros_like(log_sig_q),
                          temp=temperature)
        z0 = (1 - alphas[0]) * dist_enc.mu + alphas[0] * dist_dec.sample(keys[0])[0]

        bsz = x.shape[0]
        y = jnp.broadcast_to(p["const_prior"], (bsz,) + p["const_prior"].shape[1:])
        y = _conv(p["dec_combiners_0_0"]["conv"],
                  jnp.concatenate([y, z0], axis=-1), pad=0)

        # ---- decoder towers: scan groups within each scale
        latent_idx = 1
        for sc in range(cfg.num_scales):
            n_groups = gps[sc] - (1 if sc == 0 else 0)
            if n_groups > 0:
                feat_stack = feats[sc][1:] if sc == 0 else feats[sc]
                a_slice = lax.dynamic_slice_in_dim(alphas, latent_idx, n_groups)
                k_slice = lax.dynamic_slice_in_dim(keys, latent_idx, n_groups)

                def dec_body(carry, xs):
                    yy = carry
                    gp, feat, a, kk = xs
                    for c in range(ncell):
                        yy = _dec_cell(gp["cells"][f"cell_{c}"]["p"],
                                       gp["cells"][f"cell_{c}"]["s"], yy, False)
                    mu_p, ls_p = jnp.split(
                        _conv(gp["dec_sampler"], jax.nn.elu(yy), pad=0), 2, axis=-1)
                    comb = feat + _conv(gp["enc_combiner"], yy, pad=0)
                    mu_q, ls_q = jnp.split(_conv(gp["enc_sampler"], comb), 2, axis=-1)
                    d_enc = Normal(mu_p + mu_q, ls_p + ls_q)
                    d_dec = Normal(mu_p, ls_p, temp=temperature)
                    z = (1 - a) * d_enc.mu + a * d_dec.sample(kk)[0]
                    yy = _conv(gp["dec_combiner"],
                               jnp.concatenate([yy, z], axis=-1), pad=0)
                    return yy, None

                y, _ = lax.scan(dec_body, y,
                                (p[f"dec_scan_{sc}"], feat_stack, a_slice, k_slice))
                latent_idx += n_groups
            if sc < cfg.num_scales - 1:
                u = p[f"dec_up_{sc}"]
                y = _dec_cell(u["p"], u["s"], y, True)

        # ---- postprocessing + mixture mean
        for b in range(cfg.n_pre_post_blocks):
            for c in range(cfg.n_pre_post_cells):
                cell = p[f"post_cells_{b}_{c}"]
                stats = st[f"post_cells_{b}_{c}"]
                y = _dec_cell(cell, stats, y, upsampling="skip" in cell)
        y = jax.nn.elu(y)
        logits = _conv(p["to_logits_conv"], y)
        out = DiscMixLogistic(logits).mean()
        return out * 0.5 + 0.5

    return purify_apply
