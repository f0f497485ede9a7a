"""TRADES fine-tuning CLI (the reference's
trades/fine_tune_classifier.py entrypoint).

Usage:
  python -m gen_adversarial_tpu.cli.trades_finetune \
      --data-path /data/cars --experiment cars \
      --classifier-path ckpts/cars/classifier.msgpack \
      --epochs 50 --lr 0.01 --cumulative-bs 128 --out ckpts/cars_trades
"""

import argparse
from pathlib import Path

import numpy as np


def main():
    p = argparse.ArgumentParser("TRADES fine-tune")
    p.add_argument("--data-path", required=True)
    p.add_argument("--experiment", choices=["gender", "ids", "cars"], required=True)
    p.add_argument("--classifier-path", required=True)
    p.add_argument("--epochs", type=int, required=True)
    p.add_argument("--lr", type=float, required=True)
    p.add_argument("--cumulative-bs", type=int, required=True)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", required=True)
    args = p.parse_args()

    import jax
    import optax
    from gen_adversarial_tpu.core.config import IMAGE_SIZE, N_CLASSES
    from gen_adversarial_tpu.core.checkpoint import load_variables, save_variables
    from gen_adversarial_tpu.data.datasets import ImageLabelDataset, iterate_batches
    from gen_adversarial_tpu.eval.factory import CLASSIFIER_TYPE
    from gen_adversarial_tpu.models.classifiers import make_classifier
    from gen_adversarial_tpu.train.classifier import TrainState
    from gen_adversarial_tpu.train.trades import TRADES_RECIPES, make_trades_train_step

    image_size = IMAGE_SIZE[args.experiment]
    model = make_classifier(CLASSIFIER_TYPE[args.experiment],
                            N_CLASSES[args.experiment])
    variables, _ = load_variables(args.classifier_path)
    tx = optax.sgd(args.lr, momentum=0.9)
    state = TrainState.create(apply_fn=model.apply, params=variables["params"],
                              tx=tx, batch_stats=variables.get("batch_stats", {}))

    recipe = TRADES_RECIPES[args.experiment]
    step = make_trades_train_step(beta=recipe["beta"], epsilon=recipe["epsilon"])

    tds = ImageLabelDataset(f"{args.data_path}/train", image_size)
    key = jax.random.PRNGKey(args.seed)
    for epoch in range(args.epochs):
        losses = []
        for batch in iterate_batches(tds, args.cumulative_bs, shuffle=True,
                                     seed=args.seed + epoch):
            import jax.numpy as jnp
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            key, sub = jax.random.split(key)
            state, loss = step(state, batch, sub)
            losses.append(float(loss))
        print(f"[epoch {epoch + 1}/{args.epochs}] trades loss {np.mean(losses):.4f}")

    save_variables(Path(args.out) / "last.msgpack",
                   {"params": jax.device_get(state.params),
                    "batch_stats": jax.device_get(state.batch_stats)},
                   {"experiment": args.experiment, "trades": recipe})


if __name__ == "__main__":
    main()
