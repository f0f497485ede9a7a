"""Classifier training CLI (the reference's classifier/train.py entrypoint;
torchrun/mpirun rank plumbing is unnecessary - jax enumerates local devices
and `--n-devices` caps the DP mesh).

Usage:
  python -m gen_adversarial_tpu.cli.train_classifier \
      --data-path /data/celeba_gender --model-type resnet --n-classes 2 \
      --image-size 256 --cumulative-bs 128 --epochs 50 --lr 0.1 \
      --checkpoint-path ckpts/gender
"""

import argparse
from pathlib import Path


def main():
    p = argparse.ArgumentParser("TPU classifier training")
    p.add_argument("--data-path", required=True,
                   help="directory with train/ and validation/ subfolders")
    p.add_argument("--model-type", choices=["resnext", "resnet", "vgg"],
                   required=True)
    p.add_argument("--n-classes", type=int, required=True)
    p.add_argument("--cumulative-bs", type=int, required=True)
    p.add_argument("--image-size", type=int, required=True)
    p.add_argument("--epochs", type=int, required=True)
    p.add_argument("--lr", type=float, required=True)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--n-devices", type=int, default=None)
    p.add_argument("--checkpoint-path", default=None)
    args = p.parse_args()

    from gen_adversarial_tpu.data.datasets import ImageLabelDataset
    from gen_adversarial_tpu.train.classifier import fit

    tds = ImageLabelDataset(f"{args.data_path}/train", args.image_size)
    vds = ImageLabelDataset(f"{args.data_path}/validation", args.image_size)
    state, history = fit(args.model_type, args.n_classes, args.image_size,
                         tds, vds, epochs=args.epochs, lr=args.lr,
                         batch_size=args.cumulative_bs, seed=args.seed,
                         n_devices=args.n_devices)

    if args.checkpoint_path:
        from gen_adversarial_tpu.core.checkpoint import save_variables
        import jax
        save_variables(Path(args.checkpoint_path) / "last.msgpack",
                       {"params": jax.device_get(state.params),
                        "batch_stats": jax.device_get(state.batch_stats)},
                       {"model_type": args.model_type,
                        "n_classes": args.n_classes,
                        "history": history})


if __name__ == "__main__":
    main()
