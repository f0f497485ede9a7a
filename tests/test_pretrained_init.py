"""ImageNet-pretrained backbone initialization (--pretrained).

The reference trains every classifier from torchvision DEFAULT weights with
the original head replaced by a fresh projector (classifier/model.py:
15-16,36-37,57-58).  convert_torchvision_backbone maps a RAW torchvision
state dict onto the flax backbone and keeps the projector from a fresh
init; these tests check (a) exact weight placement vs the full reference
converter, (b) structure match against model.init for the real resnet50
shape, and (c) that fine-tuning from a useful backbone beats from-scratch
on the synthetic task (the behavioral point of pretrained init).
"""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from tests.torch_refs import TVVgg, TVResNet, WrappedClassifier, numpy_state_dict
from tests.test_train_classifier import TINY_PLAN, _synthetic_batch
from gen_adversarial_tpu.models.classifiers import VGG11BN, ResNet50
from gen_adversarial_tpu.core.torch_convert import (
    convert_vgg, convert_torchvision_backbone)
from gen_adversarial_tpu.train.classifier import (
    create_train_state, train_step, eval_step)


def test_backbone_weights_match_full_converter_head_kept_fresh():
    torch.manual_seed(0)
    tv = TVVgg(TINY_PLAN, n_classes=4)
    # reference-style full conversion (with 'model.' wrapper + projector)
    full = convert_vgg(numpy_state_dict(WrappedClassifier(tv)), plan=TINY_PLAN)
    # raw torchvision-style dict: no wrapper, original head dropped
    raw = numpy_state_dict(tv)
    model = VGG11BN(n_classes=4, plan=TINY_PLAN)
    init = model.init(jax.random.PRNGKey(3), jnp.zeros((1, 32, 32, 3)),
                      train=False)
    out = convert_torchvision_backbone(raw, "vgg", init, plan=TINY_PLAN)

    full_flat = dict(jax.tree.leaves_with_path(full["params"]))
    init_flat = dict(jax.tree.leaves_with_path(
        jax.tree.map(np.asarray, dict(init["params"]))))
    for path, leaf in jax.tree.leaves_with_path(out["params"]):
        if "classifier" in jax.tree_util.keystr(path):
            # head must come verbatim from the fresh init, NOT the torch dict
            np.testing.assert_array_equal(np.asarray(leaf), init_flat[path],
                                          err_msg=str(path))
        else:
            np.testing.assert_array_equal(np.asarray(leaf),
                                          np.asarray(full_flat[path]),
                                          err_msg=str(path))
    # full variable tree structurally identical to model.init
    assert (jax.tree.structure({"params": out["params"],
                                "batch_stats": out["batch_stats"]})
            == jax.tree.structure(jax.tree.map(np.asarray, dict(init))))


def test_resnet50_backbone_structure_matches_init():
    torch.manual_seed(0)
    tv = TVResNet((3, 4, 6, 3), n_classes=1000)  # torchvision resnet50 shape
    raw = numpy_state_dict(tv)
    model = ResNet50(n_classes=2)
    init_shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                           train=False))
    out = convert_torchvision_backbone(raw, "resnet", init_shapes)
    tree = {"params": out["params"], "batch_stats": out["batch_stats"]}
    assert jax.tree.structure(tree) == jax.tree.structure(dict(init_shapes))
    flat_out = jax.tree.leaves_with_path(tree)
    flat_init = dict(jax.tree.leaves_with_path(dict(init_shapes)))
    for path, leaf in flat_out:
        assert tuple(leaf.shape) == tuple(flat_init[path].shape), path


def test_finetune_from_pretrained_beats_scratch():
    import optax
    from gen_adversarial_tpu.train.augment import eval_normalize

    model = VGG11BN(n_classes=4, plan=TINY_PLAN)
    batch = _synthetic_batch(n=32, size=32)
    batch = jax.tree.map(jnp.asarray, batch)

    def eval_ce(state):
        """Deterministic eval-mode cross-entropy (per-step train losses are
        too noisy under the random augmentations to compare single draws)."""
        logits = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            eval_normalize(batch["image"]), train=False)
        return float(optax.softmax_cross_entropy_with_integer_labels(
            logits, batch["label"]).mean())

    # "pretrain" a backbone on the task to get useful features
    donor = create_train_state(model, jax.random.PRNGKey(0), 32, lr=0.01)
    key = jax.random.PRNGKey(1)
    for _ in range(40):
        key, sub = jax.random.split(key)
        donor, _ = train_step(donor, batch, sub)

    # two independent-buffer copies of the same fresh init: train_step
    # donates its input state, so the two runs must not share leaves
    fresh = create_train_state(model, jax.random.PRNGKey(7), 32, lr=0.01)
    fresh2 = create_train_state(model, jax.random.PRNGKey(7), 32, lr=0.01)
    pre_params = dict(fresh2.params)
    pre_stats = dict(fresh2.batch_stats)
    for k in donor.params:
        if k != "classifier":
            pre_params[k] = donor.params[k]
            if k in donor.batch_stats:
                pre_stats[k] = donor.batch_stats[k]
    pretrained = fresh2.replace(params=pre_params, batch_stats=pre_stats)

    def run(state, steps=5, seed=2):
        k = jax.random.PRNGKey(seed)
        for _ in range(steps):
            k, sub = jax.random.split(k)
            state, _ = train_step(state, batch, sub)
        return eval_ce(state)

    ce_p = run(pretrained)
    ce_s = run(fresh)
    assert ce_p < ce_s, (ce_p, ce_s)
