"""CI-style smoke of the FULL 45-config experiment matrix on real hardware
(VERDICT round 1, item 8).

For every YAML in configs/: fabricate format-correct (tiny-where-possible)
checkpoints for the models the config names, point a copy of the config at
them, run load_defense -> one-batch run_benchmark (deepfool only, EoT-2)
-> results.json, and record ok/error per config.  Proves every config
family executes end-to-end: config schema -> factory -> defense pytree ->
jitted attack -> results writer (reference flow: load_defense.py:17-146 +
test_defense.py:106-291).

Model scales: the factory hardcodes the real generator scales for gender
(StyleGAN2-1024) and cars (StyleTransformer-512) - those are fabricated at
full architecture with synthesized weights; the NVAE/competitor scales come
from checkpoint metadata / config fields and are kept tiny-but-structural
(ids NVAE keeps the real 24-group hierarchy to match the 24 alphas).

Usage: python tools/smoke_all_configs.py [--out SMOKE.json] [--only substr]
"""

import argparse
import json
import sys
import time
import traceback
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from __graft_entry__ import _synth_variables
from gen_adversarial_tpu.core.checkpoint import save_variables
from gen_adversarial_tpu.core.config import IMAGE_SIZE, N_CLASSES, experiment_of
from gen_adversarial_tpu.models.classifiers import make_classifier

CLASSIFIER_TYPE = {"gender": "resnet", "ids": "vgg", "cars": "resnext"}


def fabricate_dataset(root: Path, size: int, n_classes: int, n_per_class=2):
    from PIL import Image
    rng = np.random.RandomState(0)
    for c in range(min(n_classes, 2)):
        d = root / f"class_{c:03d}"
        d.mkdir(parents=True, exist_ok=True)
        for i in range(n_per_class):
            arr = (rng.rand(size, size, 3) * 255).astype(np.uint8)
            Image.fromarray(arr).save(d / f"{i}.png")


def fabricate_classifier(path: Path, experiment: str):
    model = make_classifier(CLASSIFIER_TYPE[experiment], N_CLASSES[experiment])
    size = IMAGE_SIZE[experiment]
    variables = _synth_variables(
        lambda k, x: model.init(k, x, train=False), jax.random.PRNGKey(0),
        jnp.zeros((1, size, size, 3)),
        cache_key=f"smoke_clf_{experiment}")
    save_variables(path, variables,
                   meta={"model_type": CLASSIFIER_TYPE[experiment]})


def fabricate_ours(path: Path, experiment: str):
    key = jax.random.PRNGKey(0)
    if experiment == "ids":
        from gen_adversarial_tpu.models.nvae.model import NVAE, NVAEConfig
        cfg_kw = dict(resolution=64, initial_channels=8, n_pre_post_blocks=1,
                      n_pre_post_cells=1, num_scales=3, num_groups_per_scale=8,
                      is_adaptive=False, num_cells_per_group=1,
                      num_latent_per_group=4, num_nf_cells=None)
        cfg = NVAEConfig(**cfg_kw)
        assert cfg.n_latents == 24, cfg.n_latents  # = the 24 ids alphas
        model = NVAE(cfg)
        variables = _synth_variables(
            lambda k, x: model.init({"params": k}, x, k), key,
            jnp.zeros((1, 64, 64, 3)), cache_key="smoke_nvae_ids")
        save_variables(path, variables, meta={"config": cfg_kw})
    elif experiment == "gender":
        from gen_adversarial_tpu.models.e4e.psp import PSP
        model = PSP(stylegan_size=1024)
        variables = _synth_variables(
            lambda k, x: model.init(k, x, method=PSP.init_all), key,
            jnp.zeros((1, 256, 256, 3)), cache_key="psp_1024")
        save_variables(path, variables, meta={"stylegan_size": 1024})
    else:
        from gen_adversarial_tpu.models.style_transformer.model import (
            StyleTransformer)
        model = StyleTransformer(output_size=512)
        variables = _synth_variables(
            lambda k, x: model.init(k, x), key,
            jnp.zeros((1, 192, 256, 3)), cache_key="trans_512")
        save_variables(path, variables, meta={"output_size": 512})


def fabricate_avae(path: Path, experiment: str):
    from gen_adversarial_tpu.models.avae.model import StyledGenerator
    size = IMAGE_SIZE[experiment]
    model = StyledGenerator(size)
    # the defense feeds the generator an avg_pooled input
    # (kernel_size from the yaml; 2 for ids per the reference configs)
    kernel = {"gender": 8, "ids": 2, "cars": 4}[experiment]
    variables = _synth_variables(
        lambda k, x: model.init(k, x, k), jax.random.PRNGKey(0),
        jnp.zeros((1, size // kernel, size // kernel, 3)),
        cache_key=f"smoke_avae_{experiment}")
    save_variables(path, variables, meta={})


def fabricate_ndvae(path: Path, experiment: str, cfg: dict):
    from gen_adversarial_tpu.models.ndvae.model import DefenceNVAE
    size = IMAGE_SIZE[experiment]
    model = DefenceNVAE(
        x_channels=cfg["x_channels"], encoding_channels=cfg["encoding_channels"],
        pre_proc_groups=cfg["pre_proc_groups"], scales=cfg["scales"],
        groups=cfg["groups"], cells=cfg["cells"], input_dim=size)
    variables = _synth_variables(
        lambda k, x: model.init(k, x, k), jax.random.PRNGKey(0),
        jnp.zeros((1, size, size, 3)), cache_key=f"smoke_ndvae_{experiment}")
    save_variables(path, variables, meta={})


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=str(REPO / "SMOKE_r02.json"))
    p.add_argument("--only", default=None,
                   help="substring filter on config names")
    p.add_argument("--work", default="/tmp/smoke_matrix")
    args = p.parse_args()

    import yaml
    from gen_adversarial_tpu.eval.factory import load_defense
    from gen_adversarial_tpu.eval.harness import run_benchmark

    work = Path(args.work)
    work.mkdir(parents=True, exist_ok=True)

    # shared artifacts per experiment
    arts = {}
    for exp in ("gender", "ids", "cars"):
        d = work / exp
        (d / "data").mkdir(parents=True, exist_ok=True)
        fabricate_dataset(d / "data", IMAGE_SIZE[exp], N_CLASSES[exp])
        clf = d / "classifier.msgpack"
        if not clf.exists():
            fabricate_classifier(clf, exp)
        arts[exp] = d

    # resume: keep prior ok results from an interrupted run (the report is
    # checkpointed per config); re-attempt failures
    results = {}
    out_path = Path(args.out)
    if out_path.exists():
        try:
            prior = json.loads(out_path.read_text()).get("configs", {})
            results = {k: v for k, v in prior.items() if v.get("ok")}
        except Exception:
            pass

    # heaviest first: the 27 ours_* configs carry the most coverage (the
    # paper's defense across all three MLVGM families)
    configs = sorted((REPO / "configs").glob("*.yaml"),
                     key=lambda p: (not p.stem.startswith("ours"), p.stem))
    for cfg_path in configs:
        name = cfg_path.stem
        if args.only and args.only not in name:
            continue
        if name in results:
            continue
        exp = experiment_of(str(cfg_path))
        d = arts[exp]
        raw = yaml.safe_load(cfg_path.read_text())
        raw["classifier_path"] = str(d / "classifier.msgpack")
        try:
            if name.startswith("ours"):
                ae = d / "ours_ae.msgpack"
                if not ae.exists():
                    fabricate_ours(ae, exp)
                raw["autoencoder_path"] = str(ae)
            elif "avae" in name:
                ae = d / "avae.msgpack"
                if not ae.exists():
                    fabricate_avae(ae, exp)
                raw["autoencoder_path"] = str(ae)
            elif "ndvae" in name:
                ae = d / "ndvae.msgpack"
                if not ae.exists():
                    fabricate_ndvae(ae, exp, raw)
                raw["autoencoder_path"] = str(ae)

            tmp_cfg = work / f"{name}.yaml"
            tmp_cfg.write_text(yaml.safe_dump(raw))

            t0 = time.time()
            # gender runs the 1024px generator: batch 1 + serialized EoT
            # keeps the deepfool class-jacobian recompute inside 16G HBM
            batch = 1 if exp == "gender" else 2
            loaded = load_defense(str(tmp_cfg), eot_steps=2,
                                  eot_chunk=1 if exp == "gender" else None)
            msgs = []
            res = run_benchmark(
                loaded, str(d / "data"), str(work / "results" / name),
                batch_size=batch, max_images=2, attack_filter="deepfool",
                plots=False, log_fn=msgs.append)
            rj = work / "results" / name / "results.json"
            assert rj.exists() and "DeepFool" in json.loads(rj.read_text())
            # attack_secs: the in-harness attack wall time (harness logs
            # '(X.Xs)' per batch).  secs - attack_secs ~= load + COMPILE —
            # the r4 outlier (ours_learned_blur_ids 1601.8s vs ~90-350s
            # siblings, VERDICT r4 weak#8) was unattributable without it;
            # each first-of-its-program-shape config pays the cold compile.
            import re
            attack_secs = sum(float(m.group(1)) for m in
                              (re.search(r"\((\d+\.\d)s\)$", str(s))
                               for s in msgs) if m)
            results[name] = {"ok": True, "secs": round(time.time() - t0, 1),
                             "attack_secs": round(attack_secs, 1),
                             "clean": res["Clean"]}
            print(f"[ok] {name} ({results[name]['secs']}s)", flush=True)
        except Exception as e:
            traceback.print_exc()
            results[name] = {"ok": False,
                             "error": f"{type(e).__name__}: {e}"}
            print(f"[FAIL] {name}: {results[name]['error']}", flush=True)
        # checkpoint after every config: a long run killed by a timeout
        # still leaves a valid partial report (compiles are persistently
        # cached, so a rerun finishes the tail quickly)
        Path(args.out).write_text(json.dumps(
            {"backend": jax.default_backend(), "partial": True,
             "ok": sum(1 for r in results.values() if r["ok"]),
             "total": len(results), "configs": results}, indent=2))

    n_ok = sum(1 for r in results.values() if r["ok"])
    summary = {"backend": jax.default_backend(), "partial": False,
               "ok": n_ok, "total": len(results), "configs": results}
    Path(args.out).write_text(json.dumps(summary, indent=2))
    print(f"[done] {n_ok}/{len(results)} configs ok -> {args.out}")
    sys.exit(0 if n_ok == len(results) else 1)


if __name__ == "__main__":
    main()
