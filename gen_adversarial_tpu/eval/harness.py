"""Attack-benchmark harness (the reference's test_defense.py:106-291 in
SerezD/gen_adversarial), redesigned TPU-first:

- the reference runs batch-size-1 per GPU process with mp.spawn; here the
  dataset is processed in jit-compiled *batches* (one XLA program per
  attack), optionally sharded over a device mesh (DP over ICI replaces
  NCCL all_gather of metric tensors),
- results land in results/<config>/results.json with the same schema:
  'Clean' accuracy + per-image minimal-L2 lists per attack, 100.0 when no
  adversary was found,
- every 5th image gets a qualitative original/adversarial/purified PNG dump
  with red/green success borders (test_defense.py:202-237), via PIL.
"""

import json
import os
import time
from functools import partial
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

from gen_adversarial_tpu.eval.factory import LoadedDefense
from gen_adversarial_tpu.data.datasets import ImageLabelDataset, iterate_batches

ATTACK_JSON_NAMES = {"deepfool": "DeepFool", "c&w": "C&W", "autoattack": "AutoAttack"}


def _pad_border(img: np.ndarray, success: bool | None, pad: int) -> np.ndarray:
    """Red/green/white border (test_defense.py:23-50 pad_image)."""
    h, w, c = img.shape
    if success is None:
        color = np.array([1.0, 1.0, 1.0])
    elif success:
        color = np.array([1.0, 0.0, 0.0])   # attack succeeded -> red
    else:
        color = np.array([0.0, 1.0, 0.0])
    out = np.tile(color, (h + 2 * pad, w + 2 * pad, 1)).astype(np.float32)
    out[pad:-pad, pad:-pad] = img
    return out


def save_example_plot(path: Path, original: np.ndarray, adversarial: np.ndarray,
                      purified: np.ndarray, success: bool, bound: float):
    """One row [original | adversarial | purified] with white/red/green-
    bordered tiles and the attack's L2 bound rendered in a title strip
    (the make_grid + plt.title dump at test_defense.py:205-237)."""
    from PIL import Image, ImageDraw
    pad = int(np.log2(original.shape[0]))
    row = np.concatenate([
        _pad_border(original, None, pad),
        _pad_border(np.clip(adversarial, 0, 1), True, pad),
        _pad_border(np.clip(purified, 0, 1), bool(success), pad)], axis=1)
    img = Image.fromarray((row * 255).astype(np.uint8))
    strip = 14
    canvas = Image.new("RGB", (img.width, img.height + strip), "black")
    canvas.paste(img, (0, strip))
    ImageDraw.Draw(canvas).text(
        (2, 2), f"original, adversarial [L2={bound:.2f}], cleaned", fill="white")
    path.parent.mkdir(parents=True, exist_ok=True)
    canvas.save(path)


def run_benchmark(loaded: LoadedDefense, images_path: str, results_folder: str,
                  batch_size: int = 8, seed: int = 42,
                  attack_filter: str | None = None, max_images: int | None = None,
                  plots: bool = True, log_fn=print,
                  n_devices: int | None = None,
                  distributed: bool = False,
                  resume: bool = True) -> dict:
    """Full benchmark over a folder dataset; returns and writes results.json.

    With resume=True (default), per-batch progress is checkpointed to
    results_folder/progress_p<pid>.json after every completed batch and a
    re-run with the same setup continues from the first unfinished batch
    with an IDENTICAL PRNG stream (skipped batches replay their key splits),
    so a crash mid-eval (a full AutoAttack batch is minutes-to-hours of TPU
    time) costs at most one batch.  This extends the reference's
    attack-level results.json merge semantics (test_defense.py:259-264) to
    batch granularity; the finished run removes the progress file and merges
    into results.json exactly as before.

    With n_devices > 1, the image batch is sharded over a data-parallel mesh
    and the defense replicated - the TPU equivalent of the reference's
    per-rank DistributedSampler shards + all_gather of metric tensors
    (test_defense.py:116,239-253); XLA runs each attack SPMD and the final
    np.asarray is the gather.

    With distributed=True (after core.distributed.maybe_initialize), each
    PROCESS additionally runs its round-robin shard of the dataset
    independently and the metric lists are all-gathered process-major at
    the end, exactly like the reference's DistributedSampler +
    all_gather/cat; process 0 writes results.json and the plots."""
    from gen_adversarial_tpu.core.distributed import process_shard, allgather_lists
    pid, pcount = process_shard() if distributed else (0, 1)

    dataset = ImageLabelDataset(images_path, loaded.image_size)
    results_folder = Path(results_folder)
    plots_folder = results_folder / "plots"

    mesh = None
    if n_devices is not None and n_devices > 1:
        from gen_adversarial_tpu.core.mesh import make_mesh, batch_sharding, replicated
        # each process runs its own dataset shard independently, so the
        # mesh must be built from this process's ADDRESSABLE devices (a
        # global mesh would hand non-zero processes remote devices)
        mesh = make_mesh(n_devices, local=pcount > 1)
        assert batch_size % n_devices == 0, (batch_size, n_devices)

    known_attacks = ("deepfool", "c&w", "autoattack")
    if attack_filter is not None and attack_filter not in known_attacks:
        raise ValueError(f"unknown attack_filter {attack_filter!r}; "
                         f"expected one of {known_attacks}")
    attack_names = [a for a in known_attacks
                    if attack_filter is None or a == attack_filter]

    from gen_adversarial_tpu.defenses.eot import eot_wrap
    defense = loaded.defense  # pytree: passed as a jit ARGUMENT so model
    # weights stay buffers, not HLO constants

    def _run_attack(fn, d, k, x, y):
        net = eot_wrap(d, loaded.eot_steps, chunk=loaded.eot_chunk)
        return fn(k, net, x, y)

    jit_attacks = {
        name: jax.jit(partial(_run_attack, loaded.attacks[name]))
        for name in attack_names}
    if "autoattack" in attack_names and os.environ.get(
            "GAT_STAGED_AA", "1") != "0":
        # host-gated staged ensemble: identical results, 3 compiled
        # programs instead of 7, and escalation stages are skipped
        # outright once every sample in the batch has succumbed
        from gen_adversarial_tpu.attacks.autoattack import make_staged_autoattack
        n_cls = loaded.attacks["autoattack"].keywords["n_classes"]
        jit_attacks["autoattack"] = make_staged_autoattack(
            n_cls, lambda d: eot_wrap(d, loaded.eot_steps,
                                      chunk=loaded.eot_chunk))
    # the qualitative-dump purify (weights as an argument like everything
    # else; eagerly it would run the full purifier op-by-op per dump)
    jit_purified = jax.jit(lambda d, k, x: d.get_purified(k, x))

    @jax.jit
    def clean_preds(d, key, x):
        net = eot_wrap(d, loaded.eot_steps, chunk=loaded.eot_chunk)
        return jnp.argmax(net(key, x), axis=1)

    if mesh is not None:
        from gen_adversarial_tpu.core.mesh import batch_sharding, replicated
        defense = jax.device_put(defense, replicated(mesh))

    key = jax.random.PRNGKey(seed + pid)
    clean_correct: list = []
    distortions = {name: [] for name in attack_names}
    n_seen = 0
    # cap is global; this process sees its round-robin share of the first
    # max_images dataset entries
    if max_images is not None:
        max_images = len(range(pid, max_images, pcount))
    plots = plots and pid == 0

    # per-batch progress checkpoint: anything that changes the batch
    # decomposition or the key stream invalidates it
    progress_path = results_folder / f"progress_p{pid}.json"
    fingerprint = {"seed": seed, "batch_size": batch_size,
                   "attacks": list(attack_names), "max_images": max_images,
                   "pid": pid, "pcount": pcount, "n_images": len(dataset),
                   "eot_steps": loaded.eot_steps,
                   # defense identity + numeric setup: a checkpoint from a
                   # different defense/experiment/dtype/chunking must never
                   # be resumed into this run (ADVICE r2)
                   "defense_type": loaded.defense_type,
                   "experiment": loaded.experiment,
                   "eot_chunk": loaded.eot_chunk, "dtype": loaded.dtype,
                   "n_devices": n_devices}
    resume_n_seen = 0
    if resume and progress_path.exists():
        try:
            prog = json.loads(progress_path.read_text())
        except (json.JSONDecodeError, OSError):
            prog = None
        if prog and prog.get("fingerprint") == fingerprint:
            resume_n_seen = int(prog["n_seen"])
            clean_correct = list(prog["clean_correct"])
            distortions = {n: list(prog["distortions"][n])
                           for n in attack_names}
            log_fn(f"[resume] continuing from image {resume_n_seen} "
                   f"({progress_path.name})")
        elif prog is not None:
            log_fn("[resume] progress file does not match this run's setup; "
                   "restarting from scratch")

    for batch in iterate_batches(dataset, batch_size, drop_last=False,
                                 shard=(pid, pcount)):
        if max_images is not None and n_seen >= max_images:
            break
        x = np.clip(np.asarray(batch["image"]), 0.0, 1.0)
        y = np.asarray(batch["label"])
        if max_images is not None and n_seen + x.shape[0] > max_images:
            x = x[: max_images - n_seen]
            y = y[: max_images - n_seen]
        if n_seen + x.shape[0] <= resume_n_seen:
            # batch already checkpointed: replay its key splits (one for
            # clean preds + one 3-way per attack) so the PRNG stream - and
            # therefore every result - is identical to an uninterrupted run
            key, _ = jax.random.split(key)
            for _name in attack_names:
                key, _ka, _kp = jax.random.split(key, 3)
            n_seen += x.shape[0]
            continue
        # pad ragged (last) batches back to batch_size: keeps ONE compiled
        # program per attack (no retrace on the tail) and keeps the batch
        # divisible by the mesh - a ragged tail would otherwise silently
        # fall off the sharded path; padded rows are trimmed from results
        b = x.shape[0]
        if b < batch_size:
            reps = np.concatenate([np.arange(b), np.zeros(batch_size - b, int)])
            x, y = x[reps], y[reps]
        x, y = jnp.asarray(x), jnp.asarray(y)
        if mesh is not None:
            sh = batch_sharding(mesh)
            x = jax.device_put(x, sh)
            y = jax.device_put(y, sh)

        key, k_clean = jax.random.split(key)
        preds = clean_preds(defense, k_clean, x)
        clean_correct.extend(np.asarray(preds == y)[:b].tolist())

        for name in attack_names:
            key, k_attack, k_pur = jax.random.split(key, 3)
            t0 = time.time()
            succ, bound, adv = jit_attacks[name](defense, k_attack, x, y)
            succ, bound = np.asarray(succ)[:b], np.asarray(bound)[:b]
            med = (float(np.nanmedian(np.where(succ, bound, np.nan)))
                   if succ.any() else float("nan"))
            log_fn(f"[{name}] batch of {b}: {succ.sum()}/{b} succeeded, "
                   f"median L2 {med:.3f} "
                   f"({time.time() - t0:.1f}s)")
            # 100.0 marks a failed attack (test_defense.py:141-199)
            distortions[name].extend(
                np.where(succ, bound, 100.0).astype(float).tolist())

            # every-5th-IMAGE qualitative dump, per attack, like the
            # reference's rank-0 `idx % 5 == 0` loop (test_defense.py:202-237)
            dump_idx = [i for i in range(b) if (n_seen + i) % 5 == 0]
            if plots and dump_idx:
                purified = np.clip(np.asarray(jit_purified(defense, k_pur, adv)), 0, 1)
                adv_np, x_np = np.asarray(adv), np.asarray(x)
                for i in dump_idx:
                    save_example_plot(
                        plots_folder / f"{name}_example={n_seen + i}.png",
                        x_np[i], adv_np[i], purified[i],
                        bool(succ[i]), float(bound[i]))
        n_seen += b
        if resume:
            tmp = progress_path.with_suffix(".tmp")
            tmp.parent.mkdir(parents=True, exist_ok=True)
            tmp.write_text(json.dumps(
                {"fingerprint": fingerprint, "n_seen": n_seen,
                 "clean_correct": clean_correct, "distortions": distortions}))
            os.replace(tmp, progress_path)  # atomic: never a torn checkpoint

    if pcount > 1:
        clean_correct = allgather_lists(clean_correct, pcount)
        distortions = {name: allgather_lists(vals, pcount)
                       for name, vals in distortions.items()}

    # unlink only AFTER the distributed allgather: if any process dies
    # inside it, every process still holds its finished-batch checkpoint
    # and the rerun replays from results instead of recomputing (ADVICE r2)
    progress_path.unlink(missing_ok=True)  # run completed (or stale file)

    results = dict(Clean=float(np.mean(clean_correct)))
    if pid == 0:
        results = _merge_results(results_folder / "results.json",
                                 results["Clean"], distortions)
        log_fn(f"[results] clean accuracy {results['Clean']:.4f}")
    else:
        results.update({ATTACK_JSON_NAMES[n]: v for n, v in distortions.items()})
    return results


def _merge_results(json_path: Path, clean_acc: float, distortions: dict) -> dict:
    """Merge-with-existing semantics (test_defense.py:259-291): re-runs of
    single attacks update rather than clobber - the de-facto eval resume."""
    if json_path.exists():
        res = json.loads(json_path.read_text())
    else:
        res = {}
    res["Clean"] = clean_acc
    for name, values in distortions.items():
        res[ATTACK_JSON_NAMES[name]] = values
    json_path.parent.mkdir(parents=True, exist_ok=True)
    json_path.write_text(json.dumps(res, indent=2))
    return res
