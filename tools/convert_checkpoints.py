"""Host-side converter: reference torch checkpoints -> flax msgpack.

This is the only place in the project that imports torch (as an IO codec;
no torch computation).  Handles every pretrained artifact format the
reference ships (loading_utils.py:10-81 in SerezD/gen_adversarial):

  classifier  {'state_dict': ...}                        -> --kind classifier
  NVAE        {'configuration', 'state_dict_temp=t'}     -> --kind nvae
  E4E         {'opts', 'latent_avg', 'state_dict'}       -> --kind e4e
  StyleTrans  {'opts', 'latent_avg', encoder.module.*}   -> --kind trans
  A-VAE       plain state dict (EMA g_running)           -> --kind avae
  ND-VAE      plain state dict                           -> --kind ndvae

Usage:
  python tools/convert_checkpoints.py --kind nvae --src ckpt.pt \
      --dst checkpoints/nvae_ids.msgpack [--temperature 0.6] [...]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def load_torch(path):
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    return ckpt


def to_numpy_sd(sd):
    return {k: v.detach().numpy() if hasattr(v, "detach") else v
            for k, v in sd.items()}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--kind", required=True,
                   choices=["classifier", "nvae", "e4e", "trans", "avae", "ndvae"])
    p.add_argument("--src", required=True)
    p.add_argument("--dst", required=True)
    p.add_argument("--model-type", default="resnet",
                   choices=["resnet", "vgg", "resnext"],
                   help="classifier kind (for --kind classifier)")
    p.add_argument("--temperature", type=float, default=0.6,
                   help="NVAE per-temperature state dict selector")
    p.add_argument("--stylegan-size", type=int, default=1024)
    p.add_argument("--output-size", type=int, default=512)
    p.add_argument("--image-size", type=int, default=128,
                   help="A-VAE / ND-VAE input resolution")
    p.add_argument("--ndvae", nargs=6, type=int, default=None,
                   metavar=("XCH", "ENC", "PREGROUPS", "SCALES", "GROUPS", "CELLS"))
    args = p.parse_args()
    if args.kind == "ndvae" and args.ndvae is None:
        p.error("--kind ndvae requires --ndvae XCH ENC PREGROUPS SCALES "
                "GROUPS CELLS (the Defence_NVAE architecture ints)")

    from gen_adversarial_tpu.core.checkpoint import save_variables
    ckpt = load_torch(args.src)
    meta = {"kind": args.kind, "source": str(args.src)}

    if args.kind == "classifier":
        from gen_adversarial_tpu.core.torch_convert import convert_classifier
        variables = convert_classifier(to_numpy_sd(ckpt["state_dict"]),
                                       args.model_type)
        meta["model_type"] = args.model_type
    elif args.kind == "nvae":
        from gen_adversarial_tpu.core.torch_convert import convert_nvae
        from gen_adversarial_tpu.models.nvae.model import NVAEConfig
        config = ckpt["configuration"]
        cfg = NVAEConfig.from_reference_dict(config["autoencoder"],
                                             config["resolution"])
        sd = to_numpy_sd(ckpt[f"state_dict_temp={args.temperature}"])
        variables = convert_nvae(sd, cfg)
        meta["config"] = cfg.__dict__
    elif args.kind == "e4e":
        from gen_adversarial_tpu.core.stylegan_convert import convert_psp
        sd = to_numpy_sd(ckpt["state_dict"])
        sd["latent_avg"] = ckpt["latent_avg"].numpy()
        variables = convert_psp(sd, args.stylegan_size)
        meta["stylegan_size"] = args.stylegan_size
    elif args.kind == "trans":
        from gen_adversarial_tpu.core.stylegan_convert import convert_style_transformer
        sd = to_numpy_sd(ckpt["state_dict"])
        if "latent_avg" in ckpt:
            sd["latent_avg"] = ckpt["latent_avg"].numpy()
        variables = convert_style_transformer(sd, args.output_size)
        meta["output_size"] = args.output_size
    elif args.kind == "avae":
        from gen_adversarial_tpu.core.avae_convert import convert_avae
        # The deployable reference artifact is a BARE g_running (EMA) state
        # dict (a_vae/train.py:82-84); 'train-iter-*.pt' resume dicts hold
        # the raw live generator instead, which the defense is NOT
        # specified to use - convert it only with a loud warning.
        if "generator" in ckpt:
            print("WARNING: this looks like an A-VAE train-iter resume "
                  "checkpoint; converting its LIVE 'generator' weights, not "
                  "the EMA g_running the reference defense loads (the EMA "
                  "weights are the bare-state-dict NNNNNN.pt files)")
            sd = to_numpy_sd(ckpt["generator"])
        else:
            sd = to_numpy_sd(ckpt)
        variables = convert_avae(sd, args.image_size)
        meta["image_size"] = args.image_size
    elif args.kind == "ndvae":
        from gen_adversarial_tpu.core.ndvae_convert import convert_ndvae
        from gen_adversarial_tpu.models.ndvae.model import DefenceNVAE
        x, enc, pre, sc, gr, ce = args.ndvae
        model = DefenceNVAE(x_channels=x, encoding_channels=enc,
                            pre_proc_groups=pre, scales=sc, groups=gr,
                            cells=ce, input_dim=args.image_size)
        variables = convert_ndvae(to_numpy_sd(ckpt), model)
        meta["ndvae"] = args.ndvae

    save_variables(args.dst, variables, meta)
    print(f"converted {args.src} -> {args.dst}")


if __name__ == "__main__":
    main()
