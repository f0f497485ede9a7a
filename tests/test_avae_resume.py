"""A-VAE training --resume: kill/restart bit-identity (the reference's
--ckpt restore reloads generator, discriminator, EMA shadow and BOTH
optimizer states, a_vae/train.py:237-243).  A run killed mid-training and
resumed must produce bit-identical artifacts to an uninterrupted run."""

import sys

import numpy as np
from flax import serialization
from PIL import Image


def _make_dataset(root, n_per_class: int = 4, size: int = 64):
    rng = np.random.RandomState(0)
    for cls in ("a", "b"):
        (root / cls).mkdir(parents=True)
        for i in range(n_per_class):
            arr = (rng.rand(size, size, 3) * 255).astype(np.uint8)
            Image.fromarray(arr).save(root / cls / f"{i}.png")


def _run_cli(monkeypatch, data, out, iters: int, resume: bool = False):
    from gen_adversarial_tpu.cli.train_avae import main
    argv = ["train_avae", "--path", str(data), "--img-size", "64",
            "--iters", str(iters), "--batch-size", "4", "--lr", "1e-3",
            "--out", str(out), "--save-every", "2"]
    if resume:
        argv.append("--resume")
    monkeypatch.setattr(sys, "argv", argv)
    main()


def _leaves(path):
    return serialization.msgpack_restore(path.read_bytes())


def test_avae_resume_bit_identity(tmp_path, monkeypatch):
    data = tmp_path / "data"
    _make_dataset(data)

    # uninterrupted 6-iteration run
    _run_cli(monkeypatch, data, tmp_path / "A", iters=6)

    # killed after 4 iterations (the last full-state checkpoint is step 4,
    # mid-epoch relative to the 2-batch epochs), then resumed to 6
    _run_cli(monkeypatch, data, tmp_path / "B", iters=4)
    _run_cli(monkeypatch, data, tmp_path / "B", iters=6, resume=True)

    a = _leaves(tmp_path / "A" / "last.msgpack")
    b = _leaves(tmp_path / "B" / "last.msgpack")
    import jax
    for pa, pb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))

    # the resumed run's full state (incl. both optimizer moments) matches
    from gen_adversarial_tpu.core.checkpoint import latest_step, load_train_state
    sa, sb = latest_step(tmp_path / "A" / "state"), \
        latest_step(tmp_path / "B" / "state")
    assert sa == sb == 6
    # structural template from a fresh init
    from gen_adversarial_tpu.train.avae import make_avae_trainers
    import jax.numpy as jnp
    gen, disc, init, *_ = make_avae_trainers(64, 2, 1e-3)
    g_vars, g_opt, d_vars, d_opt = init(jax.random.PRNGKey(0), batch=4)
    template = {"g_vars": g_vars, "g_opt": g_opt, "d_vars": d_vars,
                "d_opt": d_opt, "ema": g_vars["params"],
                "key": jax.random.PRNGKey(0),
                "it": 0, "epoch_it": 0, "batch_idx": 0}
    template = jax.device_get(template)
    full_a = load_train_state(tmp_path / "A" / "state", 6, template)
    full_b = load_train_state(tmp_path / "B" / "state", 6, template)
    for pa, pb in zip(jax.tree.leaves(full_a), jax.tree.leaves(full_b)):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))
