"""Measure the REFERENCE (torch) pipeline's throughput on available
hardware, to anchor `vs_baseline` honestly (VERDICT round 1, item 4).

The reference never publishes throughput (BASELINE.md).  No CUDA GPU exists
in this environment (torch is CPU-only), so this measures the reference's
own defense forward - EoT-32 NVAE purify + VGG11 classify at the flagship
ids scale, the exact hot loop of test_defense.py:123-199 - in torch eager
on the host CPU, and (optionally, --jax) the same-scale JAX pipeline on the
SAME CPU backend for a same-hardware software comparison.

Reference pieces exercised end-to-end via the real checkpoint formats:
  - AutoEncoder from {'configuration', 'state_dict_temp=0.6'} ckpt
    (loading_utils.py:52-67)
  - Vgg from {'state_dict'} ckpt (loading_utils.py:19-25)
  - NVAEDefenseModel.purify (ours/models.py:160-274) + EoTWrapper(32)
    (wrappers.py:4-24)

Usage:  python tools/bench_reference_torch.py [--batch 1] [--iters 3] [--jax]
Prints one JSON line per measured pipeline.
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

# flagship ids scale (matches __graft_entry__._flagship): initial_channels
# 32, 3 scales x 8 groups = 24 latent groups (= the 24 interpolation_alphas
# in configs/ours_*_ids.yaml), 20 latents/group, 64px, vgg11_bn/100.
AE_ARGS = {
    "initial_channels": 32,
    "num_pre-post_process_blocks": 1,
    "num_pre-post_process_cells": 2,
    "num_logistic_mixtures": 10,
    "num_scales": 3,
    "min_groups_per_scale": 1,
    "num_groups_per_scale": 8,
    "is_adaptive": False,
    "num_cells_per_group": 2,
    "num_latent_per_group": 20,
    "num_nf_cells": None,
}
RESOLUTION = (3, 64, 64)
EOT = 32
N_CLASSES = 100


VGG11_PLAN = (64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M")


def fabricate_checkpoints(tmp: Path):
    import torch
    from tests.reference_oracle import load_reference
    load_reference()
    from src.mlvgms_autoencoders.NVAE.model import AutoEncoder

    torch.manual_seed(0)
    nvae = AutoEncoder(AE_ARGS, resolution=RESOLUTION)
    nvae_path = tmp / "nvae_flagship.pt"
    torch.save({"configuration": {"autoencoder": AE_ARGS,
                                  "resolution": RESOLUTION},
                "state_dict_temp=0.6": nvae.state_dict()}, nvae_path)
    n_params = sum(p.numel() for p in nvae.parameters())
    return nvae_path, n_params


def bench_torch(nvae_path: Path, batch: int, iters: int,
                threads: int | None):
    import torch
    if threads:
        torch.set_num_threads(threads)
    from tests.reference_oracle import load_reference
    load_reference()
    # the reference's abstract_models.py:162 annotates with Union without
    # importing it (a def-time NameError upstream, SURVEY.md 7); seed it so
    # the module can import at all
    import builtins
    import typing
    builtins.Union = typing.Union
    from src.defenses.ours.abstract_models import BaseClassificationModel
    from src.defenses.ours.models import NVAEDefenseModel
    from src.defenses.wrappers import EoTWrapper
    from tests.torch_refs import TVVgg, WrappedClassifier

    class IdsClassifier(BaseClassificationModel, torch.nn.Module):
        """CelebaIdentityClassifier equivalent (ours/models.py:59-77) with
        the vgg11_bn backbone built locally - torchvision is not installed
        in this environment, so the reference's own Vgg class cannot
        import; TVVgg is the test suite's structural replica of it."""

        def load_classifier(self, model_path, device):
            torch.manual_seed(1)
            return WrappedClassifier(TVVgg(VGG11_PLAN, N_CLASSES)).eval()

    # same alpha schedule as our flagship bench (linear ids x 0.7)
    alphas = tuple(
        (0.04 + (1.0 - 0.04) * i / 23) for i in range(24))
    classifier = IdsClassifier("", "cpu", (0.5,) * 3, (0.5,) * 3)
    defense = NVAEDefenseModel(classifier, str(nvae_path), alphas,
                               alpha_attenuation=0.7, initial_noise_eps=2.0,
                               apply_gaussian_blur=False, device="cpu")
    net = EoTWrapper(defense, eot_steps=EOT)
    net.eval()

    x = torch.rand(batch, *RESOLUTION)
    with torch.no_grad():
        net(x)  # warmup
        t0 = time.perf_counter()
        acc = 0.0
        for _ in range(iters):
            acc += float(net(x).sum())
        dt = (time.perf_counter() - t0) / iters
    assert acc == acc  # finite
    return batch / dt


def bench_jax_cpu(batch: int, iters: int):
    """Same-scale JAX pipeline forced onto the same host CPU."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from __graft_entry__ import _flagship
    from gen_adversarial_tpu.defenses.eot import eot_wrap

    defense = _flagship()

    @jax.jit
    def step(defense, key, x):
        return jnp.sum(eot_wrap(defense, eot_steps=EOT)(key, x))

    x = jnp.asarray(np.random.RandomState(0).rand(batch, 64, 64, 3), jnp.float32)
    key = jax.random.PRNGKey(0)
    float(step(defense, key, x))  # compile + warmup
    t0 = time.perf_counter()
    outs = []
    for i in range(iters):
        key, sub = jax.random.split(key)
        outs.append(step(defense, sub, x))
    total = float(jnp.sum(jnp.stack(outs)))
    dt = (time.perf_counter() - t0) / iters
    assert total == total
    return batch / dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1,
                   help="1 = the reference harness's actual batch size "
                        "(test_defense.py:116); EoT makes the effective "
                        "model batch 32*batch either way")
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--threads", type=int, default=None)
    p.add_argument("--jax", action="store_true",
                   help="also measure the same-scale JAX pipeline on CPU")
    p.add_argument("--tmp", default="/tmp/ref_bench")
    args = p.parse_args()

    tmp = Path(args.tmp)
    tmp.mkdir(parents=True, exist_ok=True)
    nvae_path, n_params = fabricate_checkpoints(tmp)
    print(f"[fabricated] flagship NVAE ({n_params/1e6:.0f}M params) + VGG11",
          file=sys.stderr)

    img_s = bench_torch(nvae_path, args.batch, args.iters, args.threads)
    print(json.dumps({
        "metric": "reference_torch_cpu_eot32_nvae_defense_img_s",
        "value": round(img_s, 4), "unit": "img/s",
        "batch": args.batch, "eot": EOT}))

    if args.jax:
        jx = bench_jax_cpu(args.batch, args.iters)
        print(json.dumps({
            "metric": "ours_jax_cpu_eot32_nvae_defense_img_s",
            "value": round(jx, 4), "unit": "img/s",
            "batch": args.batch, "eot": EOT}))


if __name__ == "__main__":
    main()
