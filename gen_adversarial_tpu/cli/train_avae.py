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
    args = p.parse_args()

    # per-task pooling kernel (train.py:193-203)
    kernel = {64: 2, 128: 4, 256: 8}[args.img_size]

    import jax
    import jax.numpy as jnp
    from gen_adversarial_tpu.core.checkpoint import save_variables
    from gen_adversarial_tpu.data.datasets import ImageLabelDataset, iterate_batches
    from gen_adversarial_tpu.train.avae import make_avae_trainers

    gen, disc, init, d_step, g_step, accumulate = make_avae_trainers(
        args.img_size, kernel, args.lr)
    key = jax.random.PRNGKey(args.seed)
    g_vars, g_opt, d_vars, d_opt = init(key, batch=args.batch_size)
    ema = g_vars["params"]

    ds = ImageLabelDataset(args.path, args.img_size)
    it = 0
    out = Path(args.out)
    while it < args.iters:
        for batch in iterate_batches(ds, args.batch_size, shuffle=True,
                                     seed=args.seed + it):
            x = jnp.asarray(batch["image"]) * 2.0 - 1.0  # [-1,1] like the ref
            key, k1, k2 = jax.random.split(key, 3)
            d_vars, d_opt, wgan, gp = d_step(d_vars, d_opt, g_vars, x, k1)
            if (it + 1) % args.n_critic == 0:
                g_vars, g_opt, rec, kl = g_step(g_vars, g_opt, d_vars, x, k2)
                ema = accumulate(ema, g_vars["params"])
            if it % 200 == 0:
                print(f"[{it}] D {float(wgan):.3f} gp {float(gp):.3f} "
                      f"G {float(rec):.3f} KL {float(kl):.5f}")
            if it % args.save_every == 0:
                save_variables(out / f"iter_{it:07d}.msgpack",
                               {"params": jax.device_get(ema)},
                               {"img_size": args.img_size, "iter": it})
            it += 1
            if it >= args.iters:
                break
    save_variables(out / "last.msgpack", {"params": jax.device_get(ema)},
                   {"img_size": args.img_size, "iter": it})


if __name__ == "__main__":
    main()
