"""Attack-benchmark CLI (the reference's test_defense.py entrypoint).

Usage:
  python -m gen_adversarial_tpu.cli.test_defense \
      --config configs/ours_cosine_noise_cars.yaml \
      --images-path /data/cars/test \
      --results-folder results/ours_cosine_noise_cars \
      [--attack deepfool|c&w|autoattack] [--batch-size 8] [--eot-steps 32]

Unlike the reference (one process per GPU via mp.spawn, batch size 1), this
runs batched jit-compiled attacks on however many devices are visible.
"""

import argparse


def main():
    p = argparse.ArgumentParser("TPU attack benchmark")
    p.add_argument("--config", required=True)
    p.add_argument("--images-path", required=True)
    p.add_argument("--results-folder", required=True)
    p.add_argument("--attack", default=None,
                   choices=[None, "deepfool", "c&w", "autoattack"])
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--eot-steps", type=int, default=32)
    p.add_argument("--eot-chunk", type=int, default=None)
    p.add_argument("--max-images", type=int, default=None)
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="bfloat16 runs purifier+classifier in bf16 (weights "
                        "cast once, f32 logits contract; ~1.5-1.8x on TPU)")
    p.add_argument("--remat-policy", default=None,
                   help="jax.checkpoint_policies name for the purifier remat "
                        "(e.g. dots_with_no_batch_dims_saveable: +10%% on the "
                        "APGD step at small batch, tools/tune_remat.py); "
                        "default saves nothing")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--no-plots", action="store_true")
    p.add_argument("--no-resume", action="store_true",
                   help="ignore any per-batch progress checkpoint "
                        "(progress_p*.json) and restart the eval from image 0")
    p.add_argument("--n-devices", type=int, default=None,
                   help="shard each batch over a local data-parallel mesh")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host: jax.distributed.initialize (env-configured"
                        " coordinator), each process runs its dataset shard, "
                        "metrics are all-gathered (the reference's torchrun/"
                        "mp.spawn equivalent)")
    args = p.parse_args()

    distributed = False
    if args.distributed:
        from gen_adversarial_tpu.core.distributed import maybe_initialize
        distributed = maybe_initialize()

    from gen_adversarial_tpu.eval.factory import load_defense
    from gen_adversarial_tpu.eval.harness import run_benchmark

    loaded = load_defense(args.config, eot_steps=args.eot_steps,
                          eot_chunk=args.eot_chunk, dtype=args.dtype,
                          remat_policy=args.remat_policy)
    run_benchmark(loaded, args.images_path, args.results_folder,
                  batch_size=args.batch_size, seed=args.seed,
                  attack_filter=args.attack, max_images=args.max_images,
                  plots=not args.no_plots, n_devices=args.n_devices,
                  distributed=distributed, resume=not args.no_resume)


if __name__ == "__main__":
    main()
