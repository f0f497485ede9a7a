"""Random grid search over alpha vectors (reference
alpha_learning/grid_search.py: n_steps uniform-random vectors, save
alphas.npy/accuracies.npy)."""

import json
import os
from pathlib import Path

import numpy as np


def _atomic_npy(path: Path, arr: np.ndarray):
    tmp = path.with_name(path.name + ".tmp")
    with open(tmp, "wb") as f:
        np.save(f, arr)
    os.replace(tmp, path)


def save_search_step(folder: Path, alphas, accuracies, fingerprint: dict,
                     progress_name: str, extra: dict | None = None):
    """Persist the search state after one objective evaluation: the final
    alphas.npy/accuracies.npy format (partial), plus a progress marker.
    Every objective call is a full EoT epoch over the adversarial set
    (common_utils.py:81-103 in the reference), so losing evaluated rows to
    a crash costs hours; the final filenames mean even a crashed search's
    partial results are directly usable."""
    folder.mkdir(parents=True, exist_ok=True)
    _atomic_npy(folder / "alphas.npy", np.stack(alphas))
    _atomic_npy(folder / "accuracies.npy", np.asarray(accuracies))
    tmp = folder / (progress_name + ".tmp")
    tmp.write_text(json.dumps(dict(extra or {}, fingerprint=fingerprint,
                                   done=len(alphas))))
    os.replace(tmp, folder / progress_name)


def load_search_progress(folder: Path | None, fingerprint: dict,
                         progress_name: str, log_fn):
    """-> (alphas rows, accuracies rows, done, marker dict) or ([], [], 0, {})."""
    if folder is None or not (folder / progress_name).exists():
        return [], [], 0, {}
    try:
        meta = json.loads((folder / progress_name).read_text())
        a = np.load(folder / "alphas.npy")
        acc = np.load(folder / "accuracies.npy")
    except (json.JSONDecodeError, OSError, ValueError):
        return [], [], 0, {}
    done = int(meta.get("done", 0))
    if (meta.get("fingerprint") != fingerprint or a.shape[0] != done
            or acc.shape[0] != done):
        log_fn(f"[resume] {progress_name} does not match this run's setup; "
               "restarting from scratch")
        return [], [], 0, {}
    log_fn(f"[resume] continuing at evaluation {done} ({progress_name})")
    return list(a), [list(r) for r in np.atleast_2d(acc)], done, meta


def _fast_forward(objective, done: int):
    """Tell a resuming objective how many evaluations are already paid for,
    so its own PRNG stream lands where an uninterrupted run's would (see
    AlphaEvaluator.fast_forward).  Plain callables without the hook (tests,
    synthetic objectives) are left alone."""
    ff = getattr(objective, "fast_forward", None) \
        or getattr(getattr(objective, "__self__", None), "fast_forward", None)
    if ff is not None:
        ff(done)


def grid_search(objective, n_alphas: int, n_steps: int, seed: int = 0,
                results_folder: str | None = None, log_fn=print,
                resume: bool = True, fingerprint_extra: dict | None = None):
    """`fingerprint_extra`: objective-identifying fields (config path, adv
    set, eot_steps, ...) folded into the resume fingerprint - without them a
    crashed search on defense A could silently resume into a search on
    defense B sharing the same results folder (ADVICE r2)."""
    rng = np.random.RandomState(seed)
    folder = Path(results_folder) if results_folder is not None else None
    fingerprint = {"mode": "grid", "n_alphas": n_alphas, "n_steps": n_steps,
                   "seed": seed, **(fingerprint_extra or {})}
    alphas, accuracies, done, _ = ([], [], 0, {}) if not resume else \
        load_search_progress(folder, fingerprint, "grid_progress.json", log_fn)
    if done:
        # replay the RNG stream for the finished steps; if the saved rows
        # disagree the checkpoint is from a different stream - restart
        replay = [rng.uniform(0.0, 1.0, size=n_alphas) for _ in range(done)]
        if not np.allclose(np.stack(replay), np.stack(alphas)):
            log_fn("[resume] saved rows do not match the seed's RNG stream; "
                   "restarting from scratch")
            alphas, accuracies, done = [], [], 0
            rng = np.random.RandomState(seed)
    _fast_forward(objective, done)
    for s in range(done, n_steps):
        a = rng.uniform(0.0, 1.0, size=n_alphas)
        acc = objective(a)
        alphas.append(a)
        accuracies.append([acc])
        log_fn(f"[grid {s}] acc {acc:.4f}")
        if folder is not None:
            save_search_step(folder, alphas, accuracies, fingerprint,
                             "grid_progress.json")
    alphas = np.stack(alphas)
    accuracies = np.asarray(accuracies)
    if folder is not None:
        folder.mkdir(parents=True, exist_ok=True)
        _atomic_npy(folder / "alphas.npy", alphas)
        _atomic_npy(folder / "accuracies.npy", accuracies)
        (folder / "grid_progress.json").unlink(missing_ok=True)
    return alphas, accuracies


def create_adversarial_dataset(loaded, images_path: str, out_dir: str,
                               l2_bound: float, n_samples: int,
                               eot_steps: int = 32, batch_size: int = 8,
                               seed: int = 0, log_fn=print):
    """FGSM vs the reconstruction-only defense (all alphas 0) through
    EoT; keep successful adversaries as PNGs
    (alpha_learning/create_adversarial_dataset.py:45-112)."""
    import jax
    import jax.numpy as jnp
    from PIL import Image
    from gen_adversarial_tpu.attacks import fgsm_attack
    from gen_adversarial_tpu.data.datasets import ImageLabelDataset, iterate_batches
    from gen_adversarial_tpu.defenses.eot import eot_wrap

    dataset = ImageLabelDataset(images_path, loaded.image_size)

    # the defense pytree is a jit ARGUMENT: closing over loaded.net would
    # inline the purifier weight tree as XLA constants (constant-folding
    # compile blowup + duplicated on-chip memory at real scale)
    @jax.jit
    def attack(k, defense, x, y):
        net = eot_wrap(defense, eot_steps, chunk=loaded.eot_chunk)
        return fgsm_attack(k, net, x, y, l2_bound)

    key = jax.random.PRNGKey(seed)
    kept = 0
    out = Path(out_dir)
    idx = 0
    # shuffled walk, like the reference's shuffle=True DataLoader ("to allow
    # samples from all classes", create_adversarial_dataset.py:60): without
    # it the kept n_samples all come from the alphabetically-first classes.
    # `order` replays iterate_batches' shuffle so files can be named.
    order = np.arange(len(dataset))
    np.random.RandomState(seed).shuffle(order)
    for batch in iterate_batches(dataset, batch_size, drop_last=False,
                                 shuffle=True, seed=seed):
        if kept >= n_samples:
            break
        x = jnp.clip(jnp.asarray(batch["image"]), 0, 1)
        y = jnp.asarray(batch["label"])
        key, sub = jax.random.split(key)
        succ, bound, adv = attack(sub, loaded.defense, x, y)
        succ, bound = np.asarray(succ), np.asarray(bound)
        adv = np.asarray(adv)
        for i in range(x.shape[0]):
            f = dataset.files[order[idx]]
            idx += 1
            # bound > 0 excludes already-misclassified clean images, which
            # FGSM reports as zero-perturbation successes (the reference's
            # `if success and bound > 0.`, create_adversarial_dataset.py:103)
            if not succ[i] or bound[i] <= 0.0 or kept >= n_samples:
                continue
            dest = out / f.parent.name
            dest.mkdir(parents=True, exist_ok=True)
            Image.fromarray((adv[i] * 255).astype(np.uint8)).save(dest / f.name)
            kept += 1
    log_fn(f"[adv dataset] kept {kept} adversaries in {out}")
    return kept
