"""Batched, jit-compiled untargeted L2 attacks.

Every attack is a pure function of (key, net, images, labels) where
`net(key, x) -> logits` is any differentiable model (the key feeds
stochastic defenses; deterministic classifiers ignore it).  All attacks
return (success (B,) bool, l2_bound (B,) f32, adv (B,H,W,C)).

The reference implements these as per-image Python loops with .item() syncs
(src/attacks/untargeted.py); here each attack is one XLA program per batch:
lax.fori_loop over iterations, vmapped/batched math, masked per-sample
early-exit semantics.
"""

from gen_adversarial_tpu.attacks.utils import l2_norm, normalize, projection_l2
from gen_adversarial_tpu.attacks.fgsm import fgsm_attack
from gen_adversarial_tpu.attacks.apgd import apgd_attack
from gen_adversarial_tpu.attacks.cw import cw_attack
from gen_adversarial_tpu.attacks.deepfool import deepfool_attack
from gen_adversarial_tpu.attacks.fab import fab_attack
from gen_adversarial_tpu.attacks.autoattack import autoattack
