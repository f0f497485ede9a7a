"""Defense pipeline: optional gaussian blur -> optional L2-ball gaussian
noise -> normalize -> purify -> denormalize -> classifier
(reference ours/abstract_models.py:65-193 in SerezD/gen_adversarial).

Defenses are flax.struct dataclasses: model parameters (and the alpha
vector) are PYTREE LEAVES, while apply functions and hyperparameters are
static fields.  A defense therefore crosses jit boundaries as an argument -
weights are never baked into the compiled program as constants (which would
bloat the HLO by the full parameter size and defeat donation), and the
alpha-search objective can trace through alphas without retracing.
"""

import math
from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import struct

from gen_adversarial_tpu.ops.blur import gaussian_blur2d
from gen_adversarial_tpu.ops.image import clamp01


def blur_kernel_size(h: int) -> int:
    """The reference's kernel formula (abstract_models.py:150-156):
    n = sqrt(H); k = int(2**(n//2) - 1).  NOTE SURVEY.md 7: this is most
    likely a bug for log2(H) upstream (H=256 -> k=255), but the *effective*
    kernel sizes are accuracy-relevant, so they are reproduced exactly."""
    n = math.sqrt(h)
    return int(2 ** (n // 2) - 1)


def add_l2_gaussian_noise(key, x, eps: float):
    """Noise with per-sample L2 norm exactly eps (abstract_models.py:129-143)."""
    noise = jax.random.normal(key, x.shape, x.dtype)
    axes = tuple(range(1, x.ndim))
    norm = jnp.sqrt(jnp.sum(noise ** 2, axis=axes, keepdims=True))
    return clamp01(x + noise * (eps / norm))


@struct.dataclass
class ClassifierDefense:
    """Bare classifier, optional 0.5/0.5 normalization
    (abstract_models.py:13-62).  Also the 'base' and 'trades' defense types."""
    classifier_variables: Any
    classifier_apply: Callable = struct.field(pytree_node=False)
    compute_dtype: Any = struct.field(pytree_node=False, default=None)

    def classify(self, x):
        if self.compute_dtype is not None:
            x = x.astype(self.compute_dtype)
        logits = self.classifier_apply(self.classifier_variables, x)
        return logits.astype(jnp.float32)

    def __call__(self, key, x, preds_only: bool = True):
        logits = self.classify(x)
        return logits if preds_only else (logits, x)

    def get_purified(self, key, x):
        return x


@struct.dataclass
class MLVGMDefense:
    """purify-based defense (abstract_models.py:65-193)."""
    purify_variables: Any
    classifier_variables: Any
    alphas: Any
    # (variables, alphas, key, x_normalized) -> purified (normalized domain)
    purify_apply: Callable = struct.field(pytree_node=False)
    classifier_apply: Callable = struct.field(pytree_node=False)
    # optional encode/decode halves of purify_apply (defenses/purify.py
    # make_*_purify_split): encode consumes no randomness, so when the
    # input preprocessing is ALSO deterministic (initial_noise_eps == 0,
    # 27/45 configs) an EoT wrapper shares one encode across all draws
    # (defenses/eot.py) — result-identical, and the encoder tower is
    # 20-30%% of the pipeline (BASELINE.md stage roofline)
    purify_encode_apply: Any = struct.field(pytree_node=False, default=None)
    purify_decode_apply: Any = struct.field(pytree_node=False, default=None)
    image_size: int = struct.field(pytree_node=False, default=64)
    initial_noise_eps: float = struct.field(pytree_node=False, default=0.0)
    apply_blur: bool = struct.field(pytree_node=False, default=False)
    # mean/std (0.5, 0.5) normalization around purify; False for NVAE
    normalize_before_purify: bool = struct.field(pytree_node=False, default=True)
    # rematerialize the purifier in backward passes: attacks that hold many
    # cotangents (DeepFool/FAB class-jacobians x EoT x batch) OOM on HBM at
    # high resolution without this; costs ~2x purify FLOPs on those paths
    remat: bool = struct.field(pytree_node=False, default=False)
    # name of a jax.checkpoint_policies entry to apply with remat (e.g.
    # "dots_saveable" keeps matmul outputs and only recomputes the
    # bandwidth-bound elementwise chain); None = save nothing (full remat).
    # Measured on the APGD step (tools/tune_remat.py) before changing.
    remat_policy: Any = struct.field(pytree_node=False, default=None)
    # run purifier + classifier in this dtype (bf16 fast path on TPU): the
    # image is cast on entry and logits/purified outputs are cast back to
    # float32, so attack math (grads, norms, projections) stays f32 while
    # the HBM-bound model forward/backward runs at half the bandwidth.
    # Use precision.defense_astype to set this (it also casts the weights
    # once, instead of per-call).
    compute_dtype: Any = struct.field(pytree_node=False, default=None)

    def preprocess(self, key, x):
        if self.apply_blur:
            x = gaussian_blur2d(x, blur_kernel_size(self.image_size), 1.0)
        if self.initial_noise_eps > 0:
            x = add_l2_gaussian_noise(key, x, self.initial_noise_eps)
        else:
            # the reference applies add_gaussian_noise UNCONDITIONALLY
            # (abstract_models.py:174): at eps=0 it degenerates to
            # clamp(0,1), which still changes the forward and its gradient
            # on out-of-box attack iterates (DeepFool's are unclamped)
            x = clamp01(x)
        return x

    def _maybe_remat(self, apply):
        if not self.remat:
            return apply
        policy = (getattr(jax.checkpoint_policies, self.remat_policy)
                  if self.remat_policy else None)
        return jax.checkpoint(apply, policy=policy)

    def purified(self, key, x):
        k_noise, k_purify = jax.random.split(key)
        x = self.preprocess(k_noise, x)
        if self.compute_dtype is not None:
            x = x.astype(self.compute_dtype)
        if self.normalize_before_purify:
            x = (x - 0.5) / 0.5
        out = self._maybe_remat(self.purify_apply)(
            self.purify_variables, self.alphas, k_purify, x)
        if self.normalize_before_purify:
            out = out * 0.5 + 0.5
        return out

    # ---- shared-encode path (EoT cross-draw CSE, defenses/eot.py) ----
    @property
    def supports_shared_encode(self) -> bool:
        """True when purify splits into a deterministic encode + stochastic
        decode AND preprocessing is deterministic: every EoT draw then sees
        the identical encode, so it can run once.  initial_noise_eps > 0
        randomizes the encoder INPUT per draw — no sharing there."""
        return (self.purify_encode_apply is not None
                and self.purify_decode_apply is not None
                and self.initial_noise_eps == 0)

    def purify_state(self, x):
        """Run preprocessing + the deterministic encode half once.
        Only valid when supports_shared_encode."""
        x = self.preprocess(None, x)  # eps == 0: the key is never consumed
        if self.compute_dtype is not None:
            x = x.astype(self.compute_dtype)
        if self.normalize_before_purify:
            x = (x - 0.5) / 0.5
        return self._maybe_remat(self.purify_encode_apply)(
            self.purify_variables, x)

    def purified_from_state(self, key, state):
        """Stochastic decode half; key-split mirrors `purified` exactly so
        per-draw results are identical to the unshared path."""
        _, k_purify = jax.random.split(key)
        out = self._maybe_remat(self.purify_decode_apply)(
            self.purify_variables, self.alphas, k_purify, state)
        if self.normalize_before_purify:
            out = out * 0.5 + 0.5
        return out

    def state_call(self, key, state, preds_only: bool = True):
        purified = self.purified_from_state(key, state)
        logits = self.classifier_apply(self.classifier_variables, purified)
        logits = logits.astype(jnp.float32)
        if preds_only:
            return logits
        return logits, purified.astype(jnp.float32)

    def __call__(self, key, x, preds_only: bool = True):
        purified = self.purified(key, x)
        logits = self.classifier_apply(self.classifier_variables, purified)
        logits = logits.astype(jnp.float32)
        if preds_only:
            return logits
        return logits, purified.astype(jnp.float32)

    def get_purified(self, key, x):
        return self.purified(key, x).astype(jnp.float32)


def make_classifier_apply(model, mean: float | None = 0.5, std: float = 0.5):
    """BaseClassificationModel.__call__ (abstract_models.py:53-62): optional
    normalize then classifier logits.  Returns (variables, x) -> logits."""

    def classifier_apply(variables, x):
        if mean is not None:
            x = (x - mean) / std
        return model.apply(variables, x, train=False)

    return classifier_apply


def make_classifier_fn(model, variables, mean: float | None = 0.5, std: float = 0.5):
    """Convenience closure form (test/tooling use; NOT jit-friendly for
    large models - prefer ClassifierDefense with apply/variables split)."""
    apply = make_classifier_apply(model, mean, std)
    return lambda x: apply(variables, x)
