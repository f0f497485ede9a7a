"""Defense-efficacy experiment: demonstrate on TPU that the purification
defense actually *defends* (the semantic claim of the reference,
README.md:7-8 — every driver-visible run so far used synthesized random
weights, so parity was pinned but efficacy never shown).

Pipeline (each stage checkpointed under .efficacy/; re-running resumes):

  0. synth dataset   — 4-class oriented-grating images at 64px (the ids
                       family's resolution), a smooth low-dimensional
                       manifold: classes differ in global orientation,
                       adversarial perturbations are off-manifold.
  1. train classifier— small-plan VGG11-BN (models/classifiers.py) to
                       ~100% clean accuracy; normalize-only steps (the
                       augment pipeline's horizontal flip would alias the
                       45/135-degree classes).
  2. train NVAE      — models/nvae at ids structure scaled down
                       (2 scales x 2 groups = 4 latents), trained with the
                       real Adamax + annealed balanced-KL recipe
                       (train/nvae.py).
  3. alpha search    — create_adversarial_dataset (FGSM vs recon-only
                       defense) then grid search + Bayesian optimization
                       against the REAL trained defense
                       (reference alpha_learning/bayesian_optimization.py),
                       artifacts in the production npy format.
  4. harness runs    — eval/harness.run_benchmark twice at the ids attack
                       suite's real budgets (DeepFool-128, C&W 1024x8,
                       AutoAttack): bare classifier ('base' defense type)
                       vs the trained purification defense ('ours').
  5. EFFICACY_r05.json — clean accuracies, per-attack success rates and
                       median L2 bounds, bare-vs-defended comparison.

Run:  python tools/efficacy_run.py            (all stages)
      GAT_EFFICACY_STAGE=3 python tools/...   (stop after stage 3)
"""

import json
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPO = Path(__file__).resolve().parent.parent
WORK = REPO / ".efficacy"
ARTIFACTS = REPO / "artifacts" / "efficacy_r05"

IMAGE_SIZE = 64
N_CLASSES = 4
N_TRAIN_PER_CLASS = 384
N_TEST_PER_CLASS = 32
SEED = 7

# small-plan VGG11-BN: the ids classifier family (vgg11_bn + projector) at
# 1/8 width — final channels 64 -> projector d = 64*7*7 = 3136
VGG_PLAN = (16, "M", 32, "M", 64, 64, "M", 64, 64, "M", 64, 64, "M")

CLF_EPOCHS = 12
CLF_LR = 0.02
CLF_BATCH = 64

NVAE_EPOCHS = 40
NVAE_LR = 6e-3
NVAE_BATCH = 64
NVAE_INPUT_NOISE = 0.03

EOT_STEPS = 8           # EoT width for defense eval + search
EVAL_BATCH = 16
N_EVAL_IMAGES = 128     # both harness runs see the same first 128 test images


def nvae_config():
    from gen_adversarial_tpu.models.nvae.model import NVAEConfig
    return NVAEConfig(resolution=IMAGE_SIZE, initial_channels=16,
                      n_pre_post_blocks=1, n_pre_post_cells=2,
                      num_scales=2, num_groups_per_scale=2,
                      is_adaptive=False, num_cells_per_group=1,
                      num_latent_per_group=8, num_nf_cells=None,
                      num_mixtures=5)


# --------------------------------------------------------------- stage 0
def synth_image(rng: np.random.RandomState, cls: int, size: int) -> np.ndarray:
    """One grating: orientation = class identity (0/45/90/135 deg +-8),
    random frequency/phase/tint/brightness — an ~6-dim smooth manifold."""
    th = np.deg2rad(45.0 * cls) + rng.uniform(-np.pi / 22, np.pi / 22)
    freq = rng.uniform(1.5, 3.0)
    phase = rng.uniform(0, 2 * np.pi)
    g = (np.arange(size) + 0.5) / size
    xx, yy = np.meshgrid(g, g, indexing="xy")
    wave = np.sin(2 * np.pi * freq * (xx * np.cos(th) + yy * np.sin(th)) + phase)
    tint = rng.uniform(0.55, 1.0, size=3)
    base = rng.uniform(0.35, 0.55)
    img = base + 0.35 * wave[..., None] * tint[None, None, :]
    return np.clip(img, 0.0, 1.0)


def stage0_dataset(log):
    from PIL import Image
    marker = WORK / "data" / ".done"
    if marker.exists():
        return
    rng = np.random.RandomState(SEED)
    for split, n_per in (("train", N_TRAIN_PER_CLASS), ("test", N_TEST_PER_CLASS)):
        for cls in range(N_CLASSES):
            d = WORK / "data" / split / f"class_{cls}"
            d.mkdir(parents=True, exist_ok=True)
            for i in range(n_per):
                img = synth_image(rng, cls, IMAGE_SIZE)
                Image.fromarray((img * 255).round().astype(np.uint8)).save(
                    d / f"{i:04d}.png")
    marker.write_text("ok")
    log(f"[stage0] dataset written: {N_CLASSES}x{N_TRAIN_PER_CLASS} train, "
        f"{N_CLASSES}x{N_TEST_PER_CLASS} test at {IMAGE_SIZE}px")


# --------------------------------------------------------------- stage 1
def _clf_model():
    from gen_adversarial_tpu.models.classifiers import VGG11BN
    return VGG11BN(n_classes=N_CLASSES, plan=VGG_PLAN)


def stage1_classifier(log):
    import jax
    import jax.numpy as jnp
    import optax
    from gen_adversarial_tpu.core.checkpoint import save_variables, load_variables
    from gen_adversarial_tpu.data.datasets import ImageLabelDataset, iterate_batches

    path = WORK / "classifier.msgpack"
    model = _clf_model()
    if path.exists():
        variables, meta = load_variables(path)
        log(f"[stage1] classifier loaded (test acc {meta['test_acc']:.4f})")
        return model, variables, float(meta["test_acc"])

    train_ds = ImageLabelDataset(str(WORK / "data" / "train"), IMAGE_SIZE)
    test_ds = ImageLabelDataset(str(WORK / "data" / "test"), IMAGE_SIZE)

    variables = model.init(jax.random.PRNGKey(SEED),
                           jnp.zeros((1, IMAGE_SIZE, IMAGE_SIZE, 3)),
                           train=False)
    tx = optax.sgd(CLF_LR, momentum=0.9)
    opt_state = tx.init(variables["params"])

    # normalize-only training step: train_augment's horizontal flip would
    # alias the 45- and 135-degree orientation classes
    @jax.jit
    def step(variables, opt_state, batch):
        x = (jnp.clip(batch["image"], 0, 1) - 0.5) / 0.5

        def loss_fn(params):
            logits, upd = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, train=True, mutable=["batch_stats"])
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, batch["label"]).mean()
            return loss, upd

        (loss, upd), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            variables["params"])
        updates, opt_state = tx.update(grads, opt_state, variables["params"])
        variables = {"params": optax.apply_updates(variables["params"], updates),
                     "batch_stats": upd["batch_stats"]}
        return variables, opt_state, loss

    @jax.jit
    def acc_batch(variables, batch):
        x = (jnp.clip(batch["image"], 0, 1) - 0.5) / 0.5
        logits = model.apply(variables, x, train=False)
        return jnp.sum(jnp.argmax(logits, -1) == batch["label"])

    for epoch in range(CLF_EPOCHS):
        losses = []
        for batch in iterate_batches(train_ds, CLF_BATCH, shuffle=True,
                                     seed=SEED + epoch):
            variables, opt_state, loss = step(variables, opt_state, batch)
            losses.append(float(loss))
        log(f"[stage1 epoch {epoch + 1}/{CLF_EPOCHS}] "
            f"loss {np.mean(losses):.4f}")

    correct = sum(int(acc_batch(variables, b))
                  for b in iterate_batches(test_ds, EVAL_BATCH, drop_last=False))
    test_acc = correct / len(test_ds)
    log(f"[stage1] clean test accuracy {test_acc:.4f}")
    save_variables(path, variables, {"test_acc": test_acc, "plan": list(VGG_PLAN)})
    return model, variables, test_acc


# --------------------------------------------------------------- stage 2
def stage2_nvae(log, clf_model, clf_vars):
    import jax
    import jax.numpy as jnp
    from gen_adversarial_tpu.core.checkpoint import load_variables
    from gen_adversarial_tpu.data.datasets import ImageLabelDataset, iterate_batches
    from gen_adversarial_tpu.models.nvae.model import NVAE
    from gen_adversarial_tpu.train.nvae import fit_nvae

    cfg = nvae_config()
    model = NVAE(cfg)
    path = WORK / "nvae.msgpack"
    final = WORK / "nvae_final.msgpack"
    if final.exists():
        variables, meta = load_variables(final)
        log(f"[stage2] NVAE loaded (recon acc {meta['recon_acc']:.4f}, "
            f"recon L2 {meta['recon_l2']:.3f})")
        return model, variables, meta

    train_ds = ImageLabelDataset(str(WORK / "data" / "train"), IMAGE_SIZE)
    variables = fit_nvae(model, train_ds, epochs=NVAE_EPOCHS, lr=NVAE_LR,
                         batch_size=NVAE_BATCH, seed=SEED, log_fn=log,
                         checkpoint_path=str(path),
                         input_noise=NVAE_INPUT_NOISE)

    # purifier quality gate: classifier accuracy on deterministic
    # reconstructions of the TEST set + mean recon L2
    test_ds = ImageLabelDataset(str(WORK / "data" / "test"), IMAGE_SIZE)

    @jax.jit
    def recon_metrics(variables, clf_vars, key, batch):
        x = jnp.clip(batch["image"], 0, 1)
        r = model.apply(variables, x, key, True, method=NVAE.reconstruct)
        r = jnp.clip(r, 0, 1)
        logits = clf_model.apply(clf_vars, (r - 0.5) / 0.5, train=False)
        correct = jnp.sum(jnp.argmax(logits, -1) == batch["label"])
        l2 = jnp.sum(jnp.sqrt(jnp.sum((r - x) ** 2, axis=(1, 2, 3))))
        return correct, l2

    key = jax.random.PRNGKey(SEED + 99)
    correct = l2 = n = 0
    for batch in iterate_batches(test_ds, EVAL_BATCH, drop_last=False):
        key, sub = jax.random.split(key)
        c, d = recon_metrics(variables, clf_vars, sub, batch)
        correct += int(c)
        l2 += float(d)
        n += batch["label"].shape[0]
    meta = {"recon_acc": correct / n, "recon_l2": l2 / n}
    log(f"[stage2] recon classifier acc {meta['recon_acc']:.4f}, "
        f"mean recon L2 {meta['recon_l2']:.3f}")
    from gen_adversarial_tpu.core.checkpoint import save_variables
    save_variables(final, variables, meta)
    return model, variables, meta


# --------------------------------------------------------------- stage 3
def _make_defense(nvae_model, nvae_vars, clf_model, clf_vars, alphas,
                  remat=False, noise_eps=0.0):
    import jax.numpy as jnp
    from gen_adversarial_tpu.defenses.base import MLVGMDefense, make_classifier_apply
    from gen_adversarial_tpu.defenses.purify import make_nvae_purify_split, _compose

    encode_apply, decode_apply = make_nvae_purify_split(nvae_model)
    return MLVGMDefense(
        purify_variables=nvae_vars, classifier_variables=clf_vars,
        alphas=jnp.asarray(alphas, jnp.float32),
        purify_apply=_compose(encode_apply, decode_apply),
        purify_encode_apply=encode_apply, purify_decode_apply=decode_apply,
        classifier_apply=make_classifier_apply(clf_model),
        image_size=IMAGE_SIZE, initial_noise_eps=noise_eps,
        normalize_before_purify=False, remat=remat)


def _make_deepfool_adv_set(log, defense, images_path, out_dir, n_samples):
    """DeepFool adversaries vs the given defense, kept as PNGs in class
    folders (same output format as search/grid.create_adversarial_dataset)."""
    import jax
    import jax.numpy as jnp
    from PIL import Image
    from gen_adversarial_tpu.attacks.deepfool import deepfool_attack
    from gen_adversarial_tpu.data.datasets import ImageLabelDataset, iterate_batches
    from gen_adversarial_tpu.defenses.eot import eot_wrap

    dataset = ImageLabelDataset(images_path, IMAGE_SIZE)

    @jax.jit
    def attack(k, defense, x, y):
        net = eot_wrap(defense, EOT_STEPS)
        return deepfool_attack(k, net, x, y, num_classes=N_CLASSES,
                               max_iter=128)

    key = jax.random.PRNGKey(SEED)
    kept = 0
    order = np.arange(len(dataset))
    np.random.RandomState(SEED).shuffle(order)
    idx = 0
    for batch in iterate_batches(dataset, EVAL_BATCH, drop_last=False,
                                 shuffle=True, seed=SEED):
        if kept >= n_samples:
            break
        x = jnp.clip(jnp.asarray(batch["image"]), 0, 1)
        y = jnp.asarray(batch["label"])
        key, sub = jax.random.split(key)
        succ, bound, adv = attack(sub, defense, x, y)
        succ = np.asarray(succ)
        adv = np.asarray(adv)
        for i in range(x.shape[0]):
            if kept >= n_samples or not succ[i]:
                idx += 1
                continue
            f = dataset.files[order[idx]]
            d = out_dir / f.parent.name
            d.mkdir(parents=True, exist_ok=True)
            Image.fromarray((np.clip(adv[i], 0, 1) * 255).round().astype(
                np.uint8)).save(d / f.with_suffix(".png").name)
            kept += 1
            idx += 1
        log(f"[adv set] {kept}/{n_samples} kept "
            f"(batch median L2 {float(np.median(np.asarray(bound)[succ])) if succ.any() else float('nan'):.2f})")
    log(f"[adv set] done: {kept} DeepFool adversaries in {out_dir}")


def stage3_search(log, nvae_model, nvae_vars, clf_model, clf_vars):
    import jax.numpy as jnp
    from gen_adversarial_tpu.data.datasets import ImageLabelDataset
    from gen_adversarial_tpu.search.alphas import AlphaEvaluator, get_best_combination
    from gen_adversarial_tpu.search.grid import grid_search
    from gen_adversarial_tpu.search.gp import bayesian_optimize

    n_latents = nvae_model.cfg.n_latents
    best_path = WORK / "best_alphas.npy"
    if best_path.exists():
        best = np.load(best_path)
        log(f"[stage3] alphas loaded: {np.round(best, 3).tolist()}")
        return best

    # adversarial set vs the RECON-ONLY defense: all alphas 0 keeps the
    # posterior mean (models/nvae.purify_decode: z = (1-a)*mu_q + a*prior).
    # The reference generates this set with FGSM
    # (create_adversarial_dataset.py:45-112; our parity path is
    # search/grid.create_adversarial_dataset) — but on THIS task the
    # classifier's margins are large (bare-classifier DeepFool median L2
    # 6.8; recon-defense 14.4) and single-step FGSM finds 0/32 adversaries
    # even at L2 48 (probed 2026-08-21), so the set is built with DeepFool:
    # minimal-perturbation adversaries that genuinely fool the recon-only
    # defense, which is the objective the alpha search needs.
    adv_dir = WORK / "adv_set"
    defense = _make_defense(nvae_model, nvae_vars, clf_model, clf_vars,
                            np.zeros(n_latents))
    if not (adv_dir / ".done").exists():
        _make_deepfool_adv_set(log, defense, str(WORK / "data" / "train"),
                               adv_dir, n_samples=128)
        (adv_dir / ".done").write_text("ok")

    adv_ds = ImageLabelDataset(str(adv_dir), IMAGE_SIZE)
    images = np.stack([adv_ds.load_image(i) for i in range(len(adv_ds))])
    labels = adv_ds.labels
    log(f"[stage3] adversarial set: {len(adv_ds)} images")

    fp = {"experiment": "efficacy_ids_small", "eot": EOT_STEPS,
          "n_adv": len(adv_ds)}
    evaluator = AlphaEvaluator(defense, images, labels, attenuation=1.0,
                               eot_steps=EOT_STEPS, batch_size=EVAL_BATCH,
                               seed=SEED)
    grid_search(evaluator.objective_function, n_latents, n_steps=24,
                seed=SEED, results_folder=str(WORK / "search_grid"),
                log_fn=log, fingerprint_extra=fp)

    # fresh evaluator with its own EoT key stream for the BO phase (the
    # searches' resume hooks each fast-forward their OWN objective)
    bo_eval = AlphaEvaluator(defense, images, labels, attenuation=1.0,
                             eot_steps=EOT_STEPS, batch_size=EVAL_BATCH,
                             seed=SEED + 1)
    bayesian_optimize(bo_eval.objective_function, n_latents, n_steps=24,
                      seed=SEED, results_folder=str(WORK / "search_bo"),
                      log_fn=log, fingerprint_extra=fp)

    accs = {}
    for mode in ("search_grid", "search_bo"):
        best = get_best_combination(str(WORK / mode))
        acc = np.load(WORK / mode / "accuracies.npy").max()
        accs[mode] = (best, float(acc))
        log(f"[stage3] {mode}: best acc {acc:.4f} at "
            f"{np.round(best, 3).tolist()}")
    best = max(accs.values(), key=lambda t: t[1])[0]
    np.save(best_path, best)
    return best


# --------------------------------------------------------------- stage 4
def stage4_harness(log, nvae_model, nvae_vars, clf_model, clf_vars, alphas):
    from gen_adversarial_tpu.defenses.base import ClassifierDefense, make_classifier_apply
    from gen_adversarial_tpu.eval.factory import LoadedDefense, build_attacks
    from gen_adversarial_tpu.eval.harness import run_benchmark

    attacks = build_attacks("ids", N_CLASSES)
    # ids DeepFool searches the top-8 classes; this task has 4
    attacks["deepfool"].keywords["num_classes"] = N_CLASSES
    attacks["autoattack"].keywords["n_classes"] = N_CLASSES

    runs = {}
    # ours operating points, found empirically on this 16G chip
    # (2026-08-21): (batch 16, unchunked) and (batch 8, EoT-chunk 2)
    # both kernel-fault DETERMINISTICALLY inside the C&W while-loop
    # backward at specific batches; (batch 4, unchunked) runs the same
    # images clean.  DeepFool is stable at (8, chunk 2).  All of these
    # knobs are result-identical memory/serialization levers.
    OURS_POINTS = {"deepfool": (2, 8), "c&w": (None, 4),
                   "autoattack": (None, 4)}
    for name, defense, eot in (
            ("base", ClassifierDefense(clf_vars, make_classifier_apply(clf_model)),
             1),
            ("ours", _make_defense(nvae_model, nvae_vars, clf_model, clf_vars,
                                   alphas, remat=True), EOT_STEPS),
            # the ours_*_noise_ids config family (initial_noise_eps 2.0,
            # reference configs): per-EoT-draw input randomization — the
            # reference's lever against exactly the adaptive EoT attacker
            ("ours_noise", _make_defense(nvae_model, nvae_vars, clf_model,
                                         clf_vars, alphas, remat=True,
                                         noise_eps=2.0), EOT_STEPS)):
        out = WORK / f"results_{name}"
        res_file = out / "results.json"
        existing = json.loads(res_file.read_text()) if res_file.exists() else {}
        # one harness run PER ATTACK (results.json merge semantics,
        # harness._merge_results): per-attack runs + the per-batch
        # checkpoint mean the outer retry loop (run_efficacy.sh) loses at
        # most one batch of one attack per fault, and completed attacks
        # are skipped by key.
        from gen_adversarial_tpu.eval.harness import ATTACK_JSON_NAMES
        for att in ("deepfool", "c&w", "autoattack"):
            chunk, batch = (OURS_POINTS[att] if name.startswith("ours")
                            else (None, EVAL_BATCH))
            loaded = LoadedDefense(
                experiment="ids",
                defense_type="ours" if name == "ours" else "base",
                image_size=IMAGE_SIZE, n_classes=N_CLASSES, defense=defense,
                eot_steps=eot, eot_chunk=chunk, attacks=attacks)
            prog_attacks = None
            if (out / "progress_p0.json").exists():
                try:
                    prog_attacks = json.loads(
                        (out / "progress_p0.json").read_text()
                    )["fingerprint"]["attacks"]
                except Exception:
                    prog_attacks = None
            # done = merged into results.json, and any leftover progress
            # checkpoint belongs to a DIFFERENT attack's interrupted run
            done = ATTACK_JSON_NAMES[att] in existing and prog_attacks != [att]
            if done:
                log(f"[stage4] {name}/{att}: already in results.json")
                continue
            log(f"[stage4] running harness: {name}/{att} (eot={eot}, "
                f"chunk={chunk}, batch={batch})")
            run_benchmark(
                loaded, str(WORK / "data" / "test"), str(out),
                batch_size=batch, seed=SEED, max_images=N_EVAL_IMAGES,
                attack_filter=att, plots=True, log_fn=log)
            existing = json.loads(res_file.read_text())
        runs[name] = json.loads(res_file.read_text())
    return runs


# --------------------------------------------------------------- stage 5
def _attack_stats(values):
    v = np.asarray(values, float)
    succ = v < 100.0
    return {"n": int(v.size), "success_rate": float(succ.mean()),
            "median_l2_successful": (float(np.median(v[succ])) if succ.any()
                                     else None),
            "n_failed_marker_100": int((~succ).sum())}


def stage5_report(log, clf_acc, nvae_meta, alphas, runs):
    import subprocess
    ARTIFACTS.mkdir(parents=True, exist_ok=True)
    report = {
        "what": "defense-efficacy experiment: trained-small-models, real "
                "harness, ids attack suite budgets",
        "dataset": {"image_size": IMAGE_SIZE, "n_classes": N_CLASSES,
                    "train_per_class": N_TRAIN_PER_CLASS,
                    "test_per_class": N_TEST_PER_CLASS,
                    "family": "oriented gratings (smooth low-dim manifold)"},
        "models": {"classifier": f"VGG11BN plan {list(VGG_PLAN)}",
                   "clean_test_acc": clf_acc,
                   "nvae": "2 scales x 2 groups, c16 (ids structure scaled down)",
                   "nvae_recon_clf_acc": nvae_meta["recon_acc"],
                   "nvae_recon_l2": nvae_meta["recon_l2"]},
        "defense": {"type": "ours (NVAE purification); ours_noise adds the "
                            "ours_*_noise_ids family's initial_noise_eps 2.0",
                    "eot_steps": EOT_STEPS,
                    "alphas": np.asarray(alphas).round(4).tolist(),
                    "alpha_source": "grid+BO search on DeepFool adversarial set"},
        "eval": {"n_images": N_EVAL_IMAGES, "batch": EVAL_BATCH,
                 "attack_suite": "ids (DeepFool-128, C&W 1024x8 restarts, "
                                 "AutoAttack)",
                 "harness": "eval/harness.run_benchmark"},
        "results": {},
        "notes": [
            "median_l2 is over SUCCESSFUL attacks only (the harness's "
            "100.0 marker = no adversary found within the attack budget).",
            "AutoAttack's success RATE can rise under the defense while "
            "its median L2 also rises: the randomized EoT classifier has "
            "finite margins everywhere, so the escalation ladder "
            "eventually lands every image, whereas the bare classifier's "
            "most-robust images (~20%) sit beyond AA's bound ladder.  The "
            "attacker-cost claim is the L2 ratio, not the rate.",
        ],
        "device": None,
    }
    try:
        import jax
        report["device"] = str(jax.devices()[0])
    except Exception:
        pass
    for name, res in runs.items():
        entry = {"clean_acc": res["Clean"]}
        for attack in ("DeepFool", "C&W", "AutoAttack"):
            if attack in res:
                entry[attack] = _attack_stats(res[attack])
        report["results"][name] = entry

    # the headline comparison (each defended variant vs the bare classifier)
    comp = {}
    for defended in ("ours", "ours_noise"):
        if defended not in report["results"]:
            continue
        comp[defended] = {}
        for attack in ("DeepFool", "C&W", "AutoAttack"):
            b = report["results"].get("base", {}).get(attack)
            o = report["results"][defended].get(attack)
            if b and o:
                comp[defended][attack] = {
                    "success_rate_base": b["success_rate"],
                    "success_rate_defended": o["success_rate"],
                    "median_l2_base": b["median_l2_successful"],
                    "median_l2_defended": o["median_l2_successful"],
                }
    report["comparison"] = comp

    out = REPO / "EFFICACY_r05.json"
    out.write_text(json.dumps(report, indent=2))
    # copy the search + harness artifacts next to the report
    for rel in ("search_grid/alphas.npy", "search_grid/accuracies.npy",
                "search_bo/alphas.npy", "search_bo/accuracies.npy",
                "results_base/results.json", "results_ours/results.json",
                "results_ours_noise/results.json"):
        src = WORK / rel
        if src.exists():
            dst = ARTIFACTS / rel.replace("/", "_")
            dst.write_bytes(src.read_bytes())
    subprocess.run(["ls", "-la", str(ARTIFACTS)], check=False)
    log(f"[stage5] wrote {out}")
    log(json.dumps(comp, indent=2))


def main():
    def log(msg):
        print(msg, flush=True)
        with open(WORK / "log.txt", "a") as f:
            f.write(str(msg) + "\n")

    WORK.mkdir(exist_ok=True)
    stop_after = int(os.environ.get("GAT_EFFICACY_STAGE", "5"))
    stage0_dataset(log)
    if stop_after < 1:
        return
    clf_model, clf_vars, clf_acc = stage1_classifier(log)
    if stop_after < 2:
        return
    nvae_model, nvae_vars, nvae_meta = stage2_nvae(log, clf_model, clf_vars)
    if stop_after < 3:
        return
    alphas = stage3_search(log, nvae_model, nvae_vars, clf_model, clf_vars)
    if stop_after < 4:
        return
    runs = stage4_harness(log, nvae_model, nvae_vars, clf_model, clf_vars, alphas)
    if stop_after < 5:
        return
    stage5_report(log, clf_acc, nvae_meta, alphas, runs)


if __name__ == "__main__":
    main()
