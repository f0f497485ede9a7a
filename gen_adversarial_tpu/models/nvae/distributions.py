"""NVAE distributions: soft-clamped Normal and the 10-mixture discretized
logistic with PixelCNN++-style channel-autoregressive means.

Faithful NHWC re-implementation of the reference
(NVAE/modules/distributions.py in SerezD/gen_adversarial): soft_clamp +-5
(:20-29), reparam sampling (:37-45), residual-normal closed-form KL
(:56-94), DiscMixLogistic log_prob (:131-198) / gumbel sample (:200-229) /
deterministic mean (:231-254) including its asymmetric -0.999/0.99 edge
thresholds.

Everything is a pure function of explicit PRNG keys, so purify/attack code
can differentiate through sampling exactly where the reference does.
"""

import math

import jax
import jax.numpy as jnp


def soft_clamp(x: jnp.ndarray, n: float = 5.0) -> jnp.ndarray:
    return jnp.tanh(x / n) * n


class Normal:
    """N(soft_clamp(mu), temp * exp(soft_clamp(log_sigma)))."""

    def __init__(self, mu, log_sigma, temp: float = 1.0):
        self.mu = soft_clamp(mu)
        self.sigma = temp * jnp.exp(soft_clamp(log_sigma))

    def sample(self, key):
        eps = jax.random.normal(key, self.mu.shape, self.mu.dtype)
        return self.mu + eps * self.sigma, eps

    def sample_given_eps(self, eps):
        return self.mu + eps * self.sigma

    def log_p(self, samples):
        z = (samples - self.mu) / self.sigma
        return -0.5 * z ** 2 - 0.5 * math.log(2 * math.pi) - jnp.log(self.sigma)

    def kl(self, prior: "Normal"):
        delta_mu = self.mu - prior.mu
        delta_sigma = self.sigma / prior.sigma
        term1 = delta_mu ** 2 / prior.sigma ** 2
        return 0.5 * (term1 + delta_sigma ** 2) - 0.5 - jnp.log(delta_sigma)


def gumbel_argmax_one_hot(key, logits, temperature: float = 1.0):
    """One-hot of argmax(logits/T + Gumbel noise) over the last axis
    (reference gumbel_sampling, distributions.py:6-17)."""
    u = jax.random.uniform(key, logits.shape, logits.dtype, 1e-5, 1.0 - 1e-5)
    g = -jnp.log(-jnp.log(u))
    idx = jnp.argmax(logits / temperature + g, axis=-1)
    return jax.nn.one_hot(idx, logits.shape[-1], dtype=logits.dtype)


class DiscMixLogistic:
    """Mixture of discretized logistics over 3-channel images in [-1, 1].

    params: (B, H, W, M + 9M) NHWC with channel layout matching the torch
    version's '(n c)' packing: first M mixture logits, then for each mixture
    n the 9 values [mean_r, mean_g, mean_b, s_r, s_g, s_b, k_rg, k_rb, k_gb].
    """

    def __init__(self, params: jnp.ndarray, img_channels: int = 3, num_bits: int = 8):
        if img_channels != 3:
            raise NotImplementedError("only 3-channel images")
        b, h, w, ch = params.shape
        self.num_mixtures = ch // (1 + img_channels * 3)
        m = self.num_mixtures
        self.max_val = 2.0 ** num_bits - 1
        self.logits = params[..., :m]                      # (B,H,W,M)
        rest = params[..., m:].reshape(b, h, w, m, 3 * img_channels)
        self.means = rest[..., 0:3]                        # (B,H,W,M,3)
        self.log_scales = jnp.maximum(rest[..., 3:6], -7.0)
        self.coeffs = jnp.tanh(rest[..., 6:9])

    def _adjusted_means(self, samples):
        """PixelCNN++ channel-autoregressive means; samples (B,H,W,3)."""
        s = samples[..., None, :]                          # (B,H,W,1,3)
        r = self.means[..., 0]
        g = self.means[..., 1] + self.coeffs[..., 0] * s[..., 0]
        bl = self.means[..., 2] + self.coeffs[..., 1] * s[..., 0] + \
            self.coeffs[..., 2] * s[..., 1]
        return jnp.stack([r, g, bl], axis=-1)              # (B,H,W,M,3)

    def log_prob(self, samples: jnp.ndarray) -> jnp.ndarray:
        """samples in [-1,1], (B,H,W,3) -> per-pixel log prob (B,H,W)."""
        means = self._adjusted_means(samples)
        s = samples[..., None, :]
        centered = s - means
        neg_scale = jnp.exp(-self.log_scales)
        plus_in = neg_scale * (centered + 1.0 / self.max_val)
        cdf_plus = jax.nn.sigmoid(plus_in)
        min_in = neg_scale * (centered - 1.0 / self.max_val)
        cdf_min = jax.nn.sigmoid(min_in)
        log_cdf_plus = plus_in - jax.nn.softplus(plus_in)
        log_one_minus_cdf_min = -jax.nn.softplus(min_in)
        cdf_delta = cdf_plus - cdf_min
        safe = neg_scale * centered
        safe = safe - self.log_scales - 2.0 * jax.nn.softplus(safe)
        safe = safe - math.log(self.max_val / 2)
        mid = jnp.where(cdf_delta > 1e-5,
                        jnp.log(jnp.maximum(cdf_delta, 1e-10)), safe)
        log_probs = jnp.where(s < -0.999, log_cdf_plus,
                              jnp.where(s > 0.99, log_one_minus_cdf_min, mid))
        log_probs = jnp.sum(log_probs, axis=-1) + \
            jax.nn.log_softmax(self.logits, axis=-1)       # (B,H,W,M)
        return jax.scipy.special.logsumexp(log_probs, axis=-1)

    def _autoregress(self, x, k):
        r = jnp.clip(x[..., 0], -1.0, 1.0)
        g = jnp.clip(x[..., 1] + k[..., 0] * r, -1.0, 1.0)
        bl = jnp.clip(x[..., 2] + k[..., 1] * r + k[..., 2] * g, -1.0, 1.0)
        return jnp.stack([r, g, bl], axis=-1)

    def sample(self, key) -> jnp.ndarray:
        k1, k2 = jax.random.split(key)
        sel = gumbel_argmax_one_hot(k1, self.logits)[..., None]   # (B,H,W,M,1)
        mu = jnp.sum(self.means * sel, axis=-2)
        scale = jnp.sum(self.log_scales * sel, axis=-2)
        k = jnp.sum(self.coeffs * sel, axis=-2)
        u = jax.random.uniform(k2, mu.shape, mu.dtype, 1e-5, 1.0 - 1e-5)
        base = jnp.log(u) - jnp.log(1.0 - u)
        x = mu + jnp.exp(scale) * base
        return self._autoregress(x, k)

    def mean(self) -> jnp.ndarray:
        probs = jax.nn.softmax(self.logits, axis=-1)[..., None]
        mu = jnp.sum(self.means * probs, axis=-2)
        k = jnp.sum(self.coeffs * probs, axis=-2)
        return self._autoregress(mu, k)
