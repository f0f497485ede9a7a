"""StyleGAN2 generator (reference StyleGan_E4E/stylegan2/generator.py:295-479
and the Trans variant model.py:363-544), Flax / NHWC.

Holds the 8-layer equalized-lr style MLP, the constant 4x4 input, the
up-sampling StyledConv trunk and the ToRGB skip pyramid.  Fixed per-layer
noise buffers live in the 'noise' variables collection (converted from the
checkpoint's noises.noise_{i} buffers); randomize_noise=True instead draws
them from an explicit PRNG key.
"""

import math
import os
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from gen_adversarial_tpu.models.stylegan2.layers import (
    EqualLinear, StyledConv, ToRGB, pixel_norm)


def generator_channels(channel_multiplier: int = 2) -> dict:
    return {4: 512, 8: 512, 16: 512, 32: 512,
            64: 256 * channel_multiplier, 128: 128 * channel_multiplier,
            256: 64 * channel_multiplier, 512: 32 * channel_multiplier,
            1024: 16 * channel_multiplier}


class Generator(nn.Module):
    size: int
    style_dim: int = 512
    n_mlp: int = 8
    channel_multiplier: int = 2
    blur_kernel: tuple = (1, 3, 3, 1)
    lr_mlp: float = 0.01

    @property
    def log_size(self):
        return int(math.log2(self.size))

    @property
    def num_layers(self):
        return (self.log_size - 2) * 2 + 1

    @property
    def n_latent(self):
        return self.log_size * 2 - 2

    def setup(self):
        ch = generator_channels(self.channel_multiplier)
        self.style = [EqualLinear(self.style_dim, lr_mul=self.lr_mlp,
                                  activation=True) for _ in range(self.n_mlp)]
        self.const_input = self.param(
            "const_input", nn.initializers.normal(1.0), (1, 4, 4, ch[4]))
        self.conv1 = StyledConv(ch[4], 3, blur_kernel=self.blur_kernel)
        self.to_rgb1 = ToRGB(upsample=False)

        convs, to_rgbs = [], []
        in_ch = ch[4]
        for i in range(3, self.log_size + 1):
            out_ch = ch[2 ** i]
            convs.append(StyledConv(out_ch, 3, upsample=True,
                                    blur_kernel=self.blur_kernel))
            convs.append(StyledConv(out_ch, 3, blur_kernel=self.blur_kernel))
            to_rgbs.append(ToRGB())
            in_ch = out_ch
        self.convs = convs
        self.to_rgbs = to_rgbs

        # fixed noise buffers (generator.py:350-353), stored NHWC
        self.noises = [
            self.variable("noise", f"noise_{i}", jnp.zeros,
                          (1, 2 ** ((i + 5) // 2), 2 ** ((i + 5) // 2), 1))
            for i in range(self.num_layers)]

    def run_style(self, z):
        """The style MLP: z -> w (generator.py:400-401)."""
        z = pixel_norm(z)
        for layer in self.style:
            z = layer(z)
        return z

    def make_noise(self, key):
        """Fresh per-layer noise maps (generator.py:381-390)."""
        keys = jax.random.split(key, self.num_layers)
        return [jax.random.normal(keys[i], (1, 2 ** ((i + 5) // 2),
                                            2 ** ((i + 5) // 2), 1))
                for i in range(self.num_layers)]

    def mean_latent(self, key, n_latent: int):
        z = jax.random.normal(key, (n_latent, self.style_dim))
        return jnp.mean(self.run_style(z), axis=0, keepdims=True)

    def __call__(self, styles, input_is_latent: bool = False,
                 inject_index: int | None = None, truncation: float = 1.0,
                 truncation_latent=None, noise=None, randomize_noise: bool = True,
                 noise_key=None, weights_deltas: Sequence[Any] | None = None,
                 return_latents: bool = False, phase_rgb: bool = False):
        """Full generator forward (generator.py:403-479).

        styles: list of (B, style_dim) or one (B, n_latent, style_dim).
        randomize_noise=False uses the stored noise buffers; True draws fresh
        noise from noise_key (must be provided).

        phase_rgb: if the TOP block runs on the phase-domain path, return
        the image in phase-major space-to-depth layout (B, H/2, W/2, 12)
        instead of (B, H, W, 3) — callers that average-pool the output
        fold the phase mean into the pool (phase_avg_pool2) and the full-
        resolution RGB tensor is never materialized.  Detect by the
        channel count (12 vs 3): whether the top block phases is an env-
        dependent trace-time decision (layers.phase_min_res).
        """
        total_convs = len(self.convs) + len(self.to_rgbs) + 2
        if weights_deltas is None:
            weights_deltas = [None] * total_convs

        if not input_is_latent:
            styles = [self.run_style(s) for s in styles]

        if noise is None:
            if randomize_noise:
                if noise_key is None:
                    # the torch default draws fresh noise implicitly; here
                    # randomness is explicit, and silently disabling noise
                    # injection would quietly diverge from the reference
                    raise ValueError(
                        "randomize_noise=True requires noise_key (pass "
                        "randomize_noise=False to use the stored buffers)")
                keys = list(jax.random.split(noise_key, self.num_layers))
                noise = [None] * self.num_layers
            else:
                noise = [v.value for v in self.noises]
                keys = [None] * self.num_layers
        else:
            keys = [None] * self.num_layers

        if truncation < 1:
            styles = [truncation_latent + truncation * (s - truncation_latent)
                      for s in styles]

        if len(styles) < 2:
            inject = self.n_latent
            if styles[0].ndim < 3:
                latent = jnp.repeat(styles[0][:, None, :], inject, axis=1)
            else:
                latent = styles[0]
        else:
            if inject_index is None:
                raise ValueError(
                    "style mixing requires an explicit inject_index "
                    "(the reference draws random.randint at call time)")
            l1 = jnp.repeat(styles[0][:, None, :], inject_index, axis=1)
            l2 = jnp.repeat(styles[1][:, None, :],
                            self.n_latent - inject_index, axis=1)
            latent = jnp.concatenate([l1, l2], axis=1)

        b = latent.shape[0]
        out = jnp.broadcast_to(self.const_input,
                               (b,) + self.const_input.shape[1:])
        out = self.conv1(out, latent[:, 0], noise=noise[0], key=keys[0],
                         weights_delta=weights_deltas[0])
        skip = self.to_rgb1(out, latent[:, 1], weights_delta=weights_deltas[1])

        # phase-domain (space-to-depth) top blocks: at resolutions where
        # out_ch < 128 the whole block runs in (H/2, W/2, 4C) layout —
        # full TPU lanes, no 2Hx2W materialization (ops/phase_block.py;
        # gated by GAT_SG2_PHASE_MIN_RES, layers.phase_min_res)
        from gen_adversarial_tpu.models.stylegan2.layers import phase_min_res
        from gen_adversarial_tpu.ops.phase_block import depth_to_space
        min_res = phase_min_res(default=self.size)

        i, widx = 1, 2
        out_is_phase = False
        for j in range(0, len(self.convs), 2):
            conv1, conv2 = self.convs[j], self.convs[j + 1]
            to_rgb = self.to_rgbs[j // 2]
            res = 2 ** (3 + j // 2)
            use_phase = (res >= min_res and conv1.out_channels < 128
                         and weights_deltas[widx] is None
                         and weights_deltas[widx + 1] is None
                         and weights_deltas[widx + 2] is None)
            # GAT_SG2_PHASE_IN_UP=1: when consecutive blocks both phase,
            # conv1's up-conv consumes the previous block's phase layout
            # directly (lifted kernels, ops/phase_upsample) instead of
            # paying a half-lane depth_to_space at the boundary
            fuse_boundary = (out_is_phase and use_phase and os.environ.get(
                "GAT_SG2_PHASE_IN_UP", "0") == "1")
            if out_is_phase and not fuse_boundary:
                out = depth_to_space(out)  # conv1 consumes logical layout
            out_is_phase = False
            out = conv1(out, latent[:, i], noise=noise[j + 1], key=keys[j + 1],
                        weights_delta=weights_deltas[widx],
                        phase_in=fuse_boundary, phase_out=use_phase)
            out = conv2(out, latent[:, i + 1], noise=noise[j + 2], key=keys[j + 2],
                        weights_delta=weights_deltas[widx + 1],
                        phase_in=use_phase, phase_out=use_phase)
            last = j + 2 == len(self.convs)
            skip = to_rgb(out, latent[:, i + 2], skip,
                          weights_delta=weights_deltas[widx + 2],
                          phase_in=use_phase,
                          phase_out_rgb=phase_rgb and use_phase and last)
            out_is_phase = use_phase
            i += 2
            widx += 3

        image = skip
        if return_latents:
            return image, latent
        return image, None
