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


def load_pretrained_backbone(path: str, model_type: str, n_classes: int,
                             image_size: int, seed: int = 0) -> dict:
    """torchvision .pt state dict -> flax variables with a fresh projector
    head (core/torch_convert.convert_torchvision_backbone)."""
    import torch
    import jax
    import jax.numpy as jnp
    from gen_adversarial_tpu.core.torch_convert import convert_torchvision_backbone
    from gen_adversarial_tpu.models.classifiers import make_classifier

    obj = torch.load(path, map_location="cpu", weights_only=False)
    sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    model = make_classifier(model_type, n_classes)
    init = model.init(jax.random.PRNGKey(seed),
                      jnp.zeros((1, image_size, image_size, 3)), train=False)
    return convert_torchvision_backbone(sd, model_type, init)


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
    p.add_argument("--pretrained", default=None, metavar="TORCHVISION_PT",
                   help="path to a torchvision ImageNet state dict (.pt); "
                        "initializes the backbone from it with a fresh "
                        "projector head, like the reference's DEFAULT-weights "
                        "init (classifier/model.py:15-16)")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host DP: jax.distributed.initialize from "
                        "JAX_COORDINATOR/JAX_NUM_PROCESSES/JAX_PROCESS_ID "
                        "env (or auto on TPU pods); the mesh spans every "
                        "process's devices - the torchrun-DDP equivalent "
                        "(reference classifier/train.py:334-348)")
    args = p.parse_args()

    distributed = False
    if args.distributed:
        from gen_adversarial_tpu.core.distributed import maybe_initialize
        distributed = maybe_initialize()

    from gen_adversarial_tpu.data.datasets import ImageLabelDataset
    from gen_adversarial_tpu.train.classifier import fit

    init_variables = None
    if args.pretrained:
        init_variables = load_pretrained_backbone(
            args.pretrained, args.model_type, args.n_classes,
            args.image_size, args.seed)

    tds = ImageLabelDataset(f"{args.data_path}/train", args.image_size)
    vds = ImageLabelDataset(f"{args.data_path}/validation", args.image_size)
    state, history = fit(args.model_type, args.n_classes, args.image_size,
                         tds, vds, epochs=args.epochs, lr=args.lr,
                         batch_size=args.cumulative_bs, seed=args.seed,
                         n_devices=args.n_devices,
                         init_variables=init_variables,
                         distributed=distributed)

    import jax as _jax
    if distributed and _jax.process_index() != 0:
        return
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
