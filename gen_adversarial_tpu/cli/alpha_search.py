"""Alpha-schedule search CLI (the reference's alpha_learning scripts:
create_adversarial_dataset.py, grid_search.py, bayesian_optimization.py).

Usage:
  python -m gen_adversarial_tpu.cli.alpha_search \
      --mode bo|grid|make-adv --config configs/ours_linear_no_preprocessing_cars.yaml \
      --adv-images-path /data/cars_adv --n-steps 50 --results-folder results/bo_cars
"""

import argparse
from pathlib import Path

import numpy as np


def main():
    p = argparse.ArgumentParser("alpha search")
    p.add_argument("--mode", choices=["grid", "bo", "make-adv"], required=True)
    p.add_argument("--config", required=True,
                   help="an ours_* config naming classifier/autoencoder paths")
    p.add_argument("--adv-images-path", help="precomputed adversarial set")
    p.add_argument("--images-path", help="clean set (for --mode make-adv)")
    p.add_argument("--out-dir", help="destination (for --mode make-adv)")
    p.add_argument("--n-steps", type=int, default=50)
    p.add_argument("--n-samples", type=int, default=500)
    p.add_argument("--results-folder", default="alpha_search_results")
    p.add_argument("--eot-steps", type=int, default=32)
    p.add_argument("--eot-chunk", type=int, default=None,
                   help="chunk the EoT vmap to bound peak activation memory "
                        "(needed for the 1024px gender purifier)")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--no-resume", action="store_true",
                   help="ignore any per-evaluation search checkpoint "
                        "(grid/bo_progress.json) and restart from scratch")
    args = p.parse_args()

    from gen_adversarial_tpu.core.config import N_LATENTS
    from gen_adversarial_tpu.eval.factory import load_defense, load_ours_for_search
    from gen_adversarial_tpu.search.alphas import AlphaEvaluator, ALPHA_ATTENUATION
    from gen_adversarial_tpu.search.grid import grid_search, create_adversarial_dataset

    if args.mode == "make-adv":
        loaded = load_defense(args.config, eot_steps=args.eot_steps)
        # FGSM bounds per task (create_adversarial_dataset.py; 4/2/4)
        bound = {"gender": 4.0, "ids": 2.0, "cars": 4.0}[loaded.experiment]
        create_adversarial_dataset(loaded, args.images_path, args.out_dir,
                                   bound, args.n_samples,
                                   eot_steps=args.eot_steps,
                                   batch_size=args.batch_size)
        return

    from gen_adversarial_tpu.search.gp import bayesian_optimize

    exp, image_size, make_defense = load_ours_for_search(args.config)
    n_alphas = N_LATENTS[exp]

    # load the adversarial set into memory
    from gen_adversarial_tpu.data.datasets import ImageLabelDataset
    ds = ImageLabelDataset(args.adv_images_path, image_size)
    images = np.stack([ds.load_image(i) for i in range(len(ds))])
    labels = ds.labels

    evaluator = AlphaEvaluator(make_defense(np.zeros(n_alphas)), images, labels,
                               attenuation=ALPHA_ATTENUATION[exp],
                               eot_steps=args.eot_steps,
                               batch_size=args.batch_size,
                               eot_chunk=args.eot_chunk)

    folder = Path(args.results_folder)
    folder.mkdir(parents=True, exist_ok=True)
    # objective identity in the resume fingerprint: the default shared
    # --results-folder must never let a crashed search on one (config,
    # adv-set, eot) resume into a different one (ADVICE r2)
    fp_extra = {"config": args.config,
                "adv_images_path": args.adv_images_path,
                "eot_steps": args.eot_steps, "batch_size": args.batch_size}
    if args.mode == "grid":
        grid_search(evaluator.objective_function, n_alphas, args.n_steps,
                    results_folder=str(folder), resume=not args.no_resume,
                    fingerprint_extra=fp_extra)
    else:
        xs, accs = bayesian_optimize(evaluator.objective_function, n_alphas,
                                     args.n_steps, results_folder=str(folder),
                                     resume=not args.no_resume,
                                     fingerprint_extra=fp_extra)
        np.save(folder / "alphas.npy", xs)
        np.save(folder / "accuracies.npy", accs)
        best = xs[accs[:, 0].argmax()]
        print(f"best alphas: {best.tolist()} acc {accs.max():.4f}")


if __name__ == "__main__":
    main()
