"""Random grid search over alpha vectors (reference
alpha_learning/grid_search.py: n_steps uniform-random vectors, save
alphas.npy/accuracies.npy)."""

from pathlib import Path

import numpy as np


def grid_search(objective, n_alphas: int, n_steps: int, seed: int = 0,
                results_folder: str | None = None, log_fn=print):
    rng = np.random.RandomState(seed)
    alphas, accuracies = [], []
    for s in range(n_steps):
        a = rng.uniform(0.0, 1.0, size=n_alphas)
        acc = objective(a)
        alphas.append(a)
        accuracies.append([acc])
        log_fn(f"[grid {s}] acc {acc:.4f}")
    alphas = np.stack(alphas)
    accuracies = np.asarray(accuracies)
    if results_folder is not None:
        folder = Path(results_folder)
        folder.mkdir(parents=True, exist_ok=True)
        np.save(folder / "alphas.npy", alphas)
        np.save(folder / "accuracies.npy", accuracies)
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

    dataset = ImageLabelDataset(images_path, loaded.image_size)
    attack = jax.jit(lambda k, x, y: fgsm_attack(k, loaded.net, x, y, l2_bound))
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
        succ, bound, adv = attack(sub, x, y)
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
