"""StyleTransformer container: query-token encoder + StyleGAN2 generator
(reference StyleGan_Trans/models/style_transformer.py in
SerezD/gen_adversarial; note the reference's DataParallel `.module`
indirection bugs are not replicated, see SURVEY.md 7)."""

import math
import jax
import jax.numpy as jnp
from flax import linen as nn

from gen_adversarial_tpu.models.style_transformer.encoder import GradualStyleEncoder
from gen_adversarial_tpu.models.stylegan2.generator import Generator
from gen_adversarial_tpu.ops.image import adaptive_avg_pool_general


class StyleTransformer(nn.Module):
    # the cars checkpoint's generator is 512px: n_styles = 2*log2(512)-2 = 16,
    # matching the encoder's 16 query tokens and the configs' 16 alphas
    output_size: int = 512
    start_from_latent_avg: bool = True

    @property
    def n_styles(self):
        return int(math.log2(self.output_size)) * 2 - 2

    def setup(self):
        self.encoder = GradualStyleEncoder(self.n_styles)
        self.decoder = Generator(self.output_size, 512, 8)
        self.latent_avg = self.variable("buffers", "latent_avg",
                                        jnp.zeros, (self.n_styles, 512))

    def style(self, z):
        return self.decoder.run_style(z)

    def encode(self, x, train: bool = False):
        """Query-token encode (style_transformer.py:55-68): push the learned
        z through the decoder's style MLP, cross-attend against encoder
        features, shift by latent_avg."""
        b = x.shape[0]
        z = self.encoder.z  # (1, n, 512)
        n, c = z.shape[1], z.shape[2]
        zb = jnp.broadcast_to(z, (b, n, c)).reshape(b * n, c)
        query = self.decoder.run_style(zb).reshape(b, n, c)
        codes = self.encoder(x, query, train)
        if self.start_from_latent_avg:
            codes = codes + self.latent_avg.value[None]
        return codes

    def decode(self, codes, noise_key=None, randomize_noise: bool = False):
        # GAT_SG2_PHASE_RGB: phased top-block RGB (B, 256, 256, 12); the
        # phase mean IS the 2x2 face pool to 256 (see psp.decode note)
        from gen_adversarial_tpu.models.stylegan2.layers import phase_rgb_enabled
        # size >= 512 only: see psp.decode — below that the face pool
        # up-scales and the phase mean would not compose exactly
        images, _ = self.decoder([codes], input_is_latent=True,
                                 randomize_noise=randomize_noise,
                                 noise_key=noise_key,
                                 phase_rgb=(phase_rgb_enabled(default=True)
                                            and self.decoder.size >= 512))
        if images.shape[-1] == 12:
            from gen_adversarial_tpu.ops.phase_block import phase_avg_pool2
            images = phase_avg_pool2(images)
        return adaptive_avg_pool_general(images, 256, 256)

    def __call__(self, x, train: bool = False, resize: bool = True,
                 noise_key=None, randomize_noise: bool = False):
        codes = self.encode(x, train)
        images, _ = self.decoder([codes], input_is_latent=True,
                                 randomize_noise=randomize_noise,
                                 noise_key=noise_key)
        if resize:
            images = adaptive_avg_pool_general(images, 256, 256)
        return images
