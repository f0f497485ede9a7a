"""ND-VAE training CLI (the reference's train_ndvae.py entrypoint): Adamax
denoiser over paired (adversarial -> clean) folders, with per-task recipes.
Generate the adversarial folder first with
  python -m gen_adversarial_tpu.cli.alpha_search --mode make-adv ...  (or
  gen_adversarial_tpu.train.ndvae.generate_fgsm_dataset).
"""

import argparse
from pathlib import Path

import numpy as np


def main():
    p = argparse.ArgumentParser("ND-VAE training")
    p.add_argument("--images-path", required=True,
                   help="base path containing train/ and ndvae_adversaries/")
    p.add_argument("--type", dest="task",
                   choices=["celeba256", "celeba64", "cars128"], required=True)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", required=True)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from gen_adversarial_tpu.core.checkpoint import save_variables
    from gen_adversarial_tpu.data.datasets import ImageLabelDataset
    from gen_adversarial_tpu.models.ndvae.model import DefenceNVAE
    from gen_adversarial_tpu.train.ndvae import NDVAE_RECIPES, make_ndvae_train_step

    r = NDVAE_RECIPES[args.task]
    model = DefenceNVAE(input_dim=r["image_size"], **r["params"])
    key = jax.random.PRNGKey(args.seed)
    variables = jax.jit(lambda k: model.init(
        k, jnp.zeros((1, r["image_size"], r["image_size"], 3)), k))(key)

    clean_ds = ImageLabelDataset(f"{args.images_path}/train", r["image_size"])
    adv_ds = ImageLabelDataset(f"{args.images_path}/ndvae_adversaries",
                               r["image_size"])
    assert len(clean_ds) == len(adv_ds), "paired folders must align"

    n_iter_per_epoch = len(clean_ds) // r["batch_size"]
    total = r["epochs"] * n_iter_per_epoch
    tx, step = make_ndvae_train_step(model, r["lr"], total)
    opt_state = tx.init(variables["params"])

    from gen_adversarial_tpu.core.runlog import RunLog, param_summary
    log = RunLog(Path(args.out) / "log.txt")
    log(param_summary(variables["params"], f"nd_vae/{args.task}"))

    rng = np.random.RandomState(args.seed)
    gstep = 0
    for epoch in range(r["epochs"]):
        order = rng.permutation(len(clean_ds))
        losses = []
        for b in range(n_iter_per_epoch):
            idx = order[b * r["batch_size"]:(b + 1) * r["batch_size"]]
            x_orig = np.stack([clean_ds.load_image(i) for i in idx])
            x_adv = np.stack([adv_ds.load_image(i) for i in idx])
            if r["use_noise"]:  # optional extra noise (data_utils.py:121-158)
                x_adv = np.clip(
                    x_adv + rng.randn(*x_adv.shape).astype(np.float32)
                    * rng.uniform(0, r["noise_max"]), 0, 1)
            key, sub = jax.random.split(key)
            variables, opt_state, loss, recon, kl = step(
                variables, opt_state,
                {"x_adv": jnp.asarray(x_adv), "x_orig": jnp.asarray(x_orig)},
                sub, jnp.float32(gstep))
            losses.append(float(loss))
            gstep += 1
        log(f"[epoch {epoch + 1}/{r['epochs']}] loss {np.mean(losses):.2f}")

    save_variables(Path(args.out) / "nd_vae.msgpack",
                   jax.device_get(variables),
                   {"task": args.task, **{k: v for k, v in r.items()
                                          if k != "params"},
                    "params": r["params"]})


if __name__ == "__main__":
    main()
