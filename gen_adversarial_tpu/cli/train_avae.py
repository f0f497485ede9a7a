"""A-VAE WGAN-GP training CLI (the reference's a_vae/train.py entrypoint:
3M iterations, batch 32, per-task kernel size; EMA shadow generator saved
for the defense)."""

import argparse
from pathlib import Path

import numpy as np


def main():
    p = argparse.ArgumentParser("A-VAE WGAN-GP training")
    p.add_argument("--path", required=True, help="training image folder")
    p.add_argument("--img-size", type=int, choices=[64, 128, 256], required=True)
    p.add_argument("--iters", type=int, default=3_000_000)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--n-critic", type=int, default=1)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", required=True)
    p.add_argument("--save-every", type=int, default=8000)
    p.add_argument("--resume", action="store_true",
                   help="restore generator, discriminator, EMA shadow, BOTH "
                        "optimizer states, PRNG key and data position from "
                        "the latest full-state checkpoint in --out/state "
                        "(the reference's --ckpt restore, "
                        "a_vae/train.py:237-243) - a resumed 3M-iteration "
                        "WGAN run continues bit-identically")
    args = p.parse_args()

    # per-task pooling kernel (train.py:193-203)
    kernel = {64: 2, 128: 4, 256: 8}[args.img_size]

    import jax
    import jax.numpy as jnp
    from gen_adversarial_tpu.core.checkpoint import (
        latest_step, load_train_state, save_train_state, save_variables)
    from gen_adversarial_tpu.data.datasets import ImageLabelDataset, iterate_batches
    from gen_adversarial_tpu.train.avae import make_avae_trainers

    gen, disc, init, d_step, g_step, accumulate = make_avae_trainers(
        args.img_size, kernel, args.lr)
    key = jax.random.PRNGKey(args.seed)
    g_vars, g_opt, d_vars, d_opt = init(key, batch=args.batch_size)
    ema = g_vars["params"]

    out = Path(args.out)
    state_dir = out / "state"
    # full train state: everything a restart needs for bit-identity -
    # epoch_it seeds the epoch's shuffle, batch_idx is the position inside it
    state = {"g_vars": g_vars, "g_opt": g_opt, "d_vars": d_vars,
             "d_opt": d_opt, "ema": ema, "key": key,
             "it": 0, "epoch_it": 0, "batch_idx": 0}
    if args.resume:
        step = latest_step(state_dir)
        if step is not None:
            state = load_train_state(state_dir, step, state)
            print(f"[resume] restored full train state at iteration {step}")
        else:
            print("[resume] no state checkpoint found; starting fresh")
    g_vars, g_opt = state["g_vars"], state["g_opt"]
    d_vars, d_opt = state["d_vars"], state["d_opt"]
    ema, key = state["ema"], state["key"]
    it, epoch_it = int(state["it"]), int(state["epoch_it"])
    skip = int(state["batch_idx"])

    ds = ImageLabelDataset(args.path, args.img_size)

    from gen_adversarial_tpu.core.runlog import RunLog, param_summary
    log = RunLog(out / "log.txt", append=args.resume)
    log(param_summary(g_vars["params"], "a_vae/generator"))
    log(param_summary(d_vars["params"], "a_vae/discriminator"))
    if args.resume and it:
        log(f"[resume] at iteration {it}")

    def save_state(bi: int):
        save_train_state(state_dir, jax.device_get(
            {"g_vars": g_vars, "g_opt": g_opt, "d_vars": d_vars,
             "d_opt": d_opt, "ema": ema, "key": key,
             "it": it, "epoch_it": epoch_it, "batch_idx": bi}), it)

    while it < args.iters:
        # the epoch's shuffle is seeded by the iteration count at its start
        # (epoch_it), so a resumed run walks the identical batch order
        for bi, batch in enumerate(iterate_batches(ds, args.batch_size,
                                                   shuffle=True,
                                                   seed=args.seed + epoch_it)):
            if bi < skip:
                continue
            x = jnp.asarray(batch["image"]) * 2.0 - 1.0  # [-1,1] like the ref
            key, k1, k2 = jax.random.split(key, 3)
            d_vars, d_opt, wgan, gp = d_step(d_vars, d_opt, g_vars, x, k1)
            if (it + 1) % args.n_critic == 0:
                g_vars, g_opt, rec, kl = g_step(g_vars, g_opt, d_vars, x, k2)
                ema = accumulate(ema, g_vars["params"])
            if it % 200 == 0:
                log(f"[{it}] D {float(wgan):.3f} gp {float(gp):.3f} "
                    f"G {float(rec):.3f} KL {float(kl):.5f}")
            if it % args.save_every == 0:
                save_variables(out / f"iter_{it:07d}.msgpack",
                               {"params": jax.device_get(ema)},
                               {"img_size": args.img_size, "iter": it})
            it += 1
            if it % args.save_every == 0:
                save_state(bi + 1)
            if it >= args.iters:
                break
        skip = 0
        epoch_it = it
    save_variables(out / "last.msgpack", {"params": jax.device_get(ema)},
                   {"img_size": args.img_size, "iter": it})


if __name__ == "__main__":
    main()
