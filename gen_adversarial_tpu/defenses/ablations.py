"""Ablation defenses (reference ablations/models.py in
SerezD/gen_adversarial): purification is only gaussian noise (L2-ball eps)
or only gaussian blur, followed by the classifier.  Pytree dataclasses like
the main defenses (defenses/base.py)."""

from typing import Any, Callable

from flax import struct

from gen_adversarial_tpu.defenses.base import (
    add_l2_gaussian_noise, blur_kernel_size)
from gen_adversarial_tpu.ops.blur import gaussian_blur2d


@struct.dataclass
class GaussianNoiseDefense:
    """ablations/models.py:13-39: purify = add L2-eps noise."""
    classifier_variables: Any
    classifier_apply: Callable = struct.field(pytree_node=False)
    eps: float = struct.field(pytree_node=False, default=4.0)

    def get_purified(self, key, x):
        return add_l2_gaussian_noise(key, x, self.eps)

    def __call__(self, key, x, preds_only: bool = True):
        purified = self.get_purified(key, x)
        logits = self.classifier_apply(self.classifier_variables, purified)
        return logits if preds_only else (logits, purified)


@struct.dataclass
class GaussianBlurDefense:
    """ablations/models.py:42-66: purify = gaussian blur with the
    2**(sqrt(H)//2)-1 kernel."""
    classifier_variables: Any
    classifier_apply: Callable = struct.field(pytree_node=False)
    image_size: int = struct.field(pytree_node=False, default=64)

    def get_purified(self, key, x):
        return gaussian_blur2d(x, blur_kernel_size(self.image_size), 1.0)

    def __call__(self, key, x, preds_only: bool = True):
        purified = self.get_purified(key, x)
        logits = self.classifier_apply(self.classifier_variables, purified)
        return logits if preds_only else (logits, purified)
