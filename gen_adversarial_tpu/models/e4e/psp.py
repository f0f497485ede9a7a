"""pSp container: E4E encoder + StyleGAN2 generator + face pool
(reference StyleGan_E4E/psp.py in SerezD/gen_adversarial)."""

import jax
import jax.numpy as jnp
from flax import linen as nn

from gen_adversarial_tpu.models.e4e.encoder import Encoder4Editing
from gen_adversarial_tpu.models.stylegan2.generator import Generator
from gen_adversarial_tpu.ops.image import adaptive_avg_pool_general


class PSP(nn.Module):
    stylegan_size: int = 1024
    start_from_latent_avg: bool = True

    def setup(self):
        self.encoder = Encoder4Editing(self.stylegan_size)
        self.decoder = Generator(self.stylegan_size, 512, 8, channel_multiplier=2)
        # latent_avg is loaded from the checkpoint (psp.py:117-127)
        self.latent_avg = self.variable(
            "buffers", "latent_avg",
            jnp.zeros, (self.decoder.n_latent, 512))

    def encode(self, x, train: bool = False):
        """(B,H,W,C) -> codes (B, n_latent, 512), shifted by latent_avg
        (psp.py:88-101)."""
        codes = self.encoder(x, train)
        if self.start_from_latent_avg:
            codes = codes + self.latent_avg.value[None]
        return codes

    def decode(self, codes, noise_key=None, randomize_noise: bool = False):
        """codes (B, n_latent, 512) -> images pooled to 256 (psp.py:109-115).

        With GAT_SG2_PHASE_RGB the generator returns the phased top-block
        RGB (B, 512, 512, 12) and the phase mean (an exact 2x2 average
        pool) folds into this face pool — composition of uniform means is
        the same 4x4 mean as pooling the 1024px image directly."""
        from gen_adversarial_tpu.models.stylegan2.layers import phase_rgb_enabled
        # size >= 512 only: the 2x2 phase mean composes exactly with the
        # following pool-to-256 iff the face pool is a clean downscale
        # (mean of equal uniform windows); below 512 the face pool
        # up-scales and pooling first would change the result
        images, _ = self.decoder([codes], input_is_latent=True,
                                 randomize_noise=randomize_noise,
                                 noise_key=noise_key,
                                 phase_rgb=(phase_rgb_enabled()
                                            and self.decoder.size >= 512))
        if images.shape[-1] == 12:
            from gen_adversarial_tpu.ops.phase_block import phase_avg_pool2
            images = phase_avg_pool2(images)
        return adaptive_avg_pool_general(images, 256, 256)

    def style(self, z):
        """The generator's style MLP (used for sampling new w's in purify)."""
        return self.decoder.run_style(z)

    def init_all(self, x):
        """Initialization entry point that touches every submodule: the
        defense decode path uses input_is_latent=True, so a plain __call__
        init would never materialize the style-MLP parameters the purify
        mixing needs.  Use `model.init(key, x, method=PSP.init_all)`."""
        codes = self.encode(x)
        _ = self.style(jnp.zeros((1, 512), x.dtype))
        return self.decode(codes)

    def __call__(self, x, train: bool = False, resize: bool = True,
                 noise_key=None, randomize_noise: bool = False,
                 latent_mask=None, inject_latent=None, alpha=None,
                 input_code: bool = False, is_cars: bool = False,
                 return_latents: bool = False):
        """Full pSp forward (psp.py:47-86) including the latent-editing
        options: latent_mask lists style indices replaced by inject_latent
        (alpha-blended when alpha is given, zeroed when inject_latent is
        None); is_cars truncates 18 -> 16 styles."""
        if input_code:
            codes = x
        else:
            codes = self.encode(x, train)
            if codes.shape[1] == 18 and is_cars:
                codes = codes[:, :16, :]

        if latent_mask is not None:
            for i in latent_mask:
                if inject_latent is not None:
                    if alpha is not None:
                        codes = codes.at[:, i].set(
                            alpha * inject_latent[:, i] + (1 - alpha) * codes[:, i])
                    else:
                        codes = codes.at[:, i].set(inject_latent[:, i])
                else:
                    codes = codes.at[:, i].set(0.0)

        images, latents = self.decoder([codes], input_is_latent=not input_code,
                                       randomize_noise=randomize_noise,
                                       noise_key=noise_key,
                                       return_latents=return_latents)
        if resize:
            images = adaptive_avg_pool_general(images, 256, 256)
        if return_latents:
            return images, latents
        return images
