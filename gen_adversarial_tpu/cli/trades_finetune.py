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
    p.add_argument("--n-devices", type=int, default=None)
    p.add_argument("--distributed", action="store_true",
                   help="multi-host DP like the reference's torchrun DDP "
                        "fine-tuner (trades/fine_tune_classifier.py:82,239)")
    args = p.parse_args()

    import jax
    import optax

    distributed = False
    if args.distributed:
        from gen_adversarial_tpu.core.distributed import maybe_initialize
        distributed = maybe_initialize()
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

    # DP mesh, sharded like the classifier trainer (the reference's TRADES
    # fine-tuner shares the same DDP skeleton, fine_tune_classifier.py:239)
    from gen_adversarial_tpu.core.mesh import make_mesh, batch_sharding, replicated
    from gen_adversarial_tpu.train.classifier import _to_global

    n_proc = jax.process_count() if distributed else 1
    pid = jax.process_index() if distributed else 0
    if args.cumulative_bs % n_proc:
        raise SystemExit(f"--cumulative-bs {args.cumulative_bs} not divisible "
                         f"by {n_proc} processes")
    mesh = make_mesh(args.n_devices)

    tds = ImageLabelDataset(f"{args.data_path}/train", image_size)
    key = jax.random.PRNGKey(args.seed)
    # persistent log.txt next to the output artifact (classifier/train.py
    # flushes args.log the same way, train.py:309-315)
    from gen_adversarial_tpu.core.runlog import RunLog, param_summary
    log = RunLog(Path(args.out) / "log.txt") if pid == 0 \
        else (lambda s: None)
    log(param_summary(state.params, CLASSIFIER_TYPE[args.experiment]))
    with jax.set_mesh(mesh):
        state = _to_global(replicated(mesh), state)
        for epoch in range(args.epochs):
            losses = []
            # batch_slice: same global shuffled order on every process, but
            # each decodes only its contiguous 1/n_proc of each batch
            for batch in iterate_batches(tds, args.cumulative_bs, shuffle=True,
                                         seed=args.seed + epoch,
                                         batch_slice=(pid, n_proc)):
                batch = _to_global(batch_sharding(mesh), batch)
                key, sub = jax.random.split(key)
                state, loss = step(state, batch, sub)
                losses.append(float(loss))
            log(f"[epoch {epoch + 1}/{args.epochs}] "
                f"trades loss {np.mean(losses):.4f}")

    if pid == 0:
        save_variables(Path(args.out) / "last.msgpack",
                       {"params": jax.device_get(state.params),
                        "batch_stats": jax.device_get(state.batch_stats)},
                       {"experiment": args.experiment, "trades": recipe})


if __name__ == "__main__":
    main()
