"""Regenerate the 45-config experiment matrix (the reference's configs/
directory in SerezD/gen_adversarial, SURVEY.md 2.6).

The alpha vectors below are experiment DATA from the reference configs:
linear/cosine schedules as stored there (their rounding is inconsistent
with the generating formulas in common_utils.py:15-22, so the stored values
are kept verbatim), and the 'learned' vectors are the published
Bayesian-optimization results (shared across preprocessing variants).

Run:  python configs/generate_configs.py [out_dir]
"""

import sys
from pathlib import Path

import yaml

EXPERIMENTS = ("gender", "ids", "cars")

ALPHAS = {
    ("gender", "linear"): [0.05, 0.11, 0.16, 0.22, 0.27, 0.33, 0.38, 0.44, 0.5, 0.55, 0.61, 0.66, 0.72, 0.77, 0.83, 0.88, 0.94, 1.0],
    ("gender", "cosine"): [0.008, 0.03, 0.067, 0.117, 0.179, 0.25, 0.329, 0.413, 0.5, 0.587, 0.671, 0.75, 0.821, 0.883, 0.933, 0.97, 0.992, 1.0],
    ("gender", "learned"): [0.492, 0.728, 0.058, 0.331, 0.246, 0.059, 0.068, 0.526, 0.646, 0.816, 0.548, 0.692, 0.309, 0.61, 0.729, 0.348, 0.728, 0.697],
    ("ids", "linear"): [0.04, 0.08, 0.12, 0.17, 0.21, 0.25, 0.29, 0.33, 0.38, 0.42, 0.46, 0.5, 0.54, 0.58, 0.62, 0.67, 0.71, 0.75, 0.79, 0.83, 0.88, 0.92, 0.96, 1.0],
    ("ids", "cosine"): [0.0, 0.02, 0.04, 0.07, 0.1, 0.15, 0.2, 0.25, 0.31, 0.37, 0.43, 0.5, 0.57, 0.63, 0.69, 0.75, 0.8, 0.85, 0.9, 0.93, 0.96, 0.98, 1.0, 1.0],
    ("ids", "learned"): [0.0, 0.0, 0.001, 0.136, 0.131, 0.206, 0.179, 0.305, 0.347, 0.349, 0.465, 0.528, 0.551, 0.606, 0.681, 0.676, 0.834, 0.8, 0.938, 0.911, 1.0, 1.0, 1.0, 1.0],
    ("cars", "linear"): [0.062, 0.125, 0.188, 0.25, 0.312, 0.375, 0.438, 0.5, 0.562, 0.625, 0.688, 0.75, 0.812, 0.875, 0.938, 1.0],
    ("cars", "cosine"): [0.01, 0.038, 0.084, 0.146, 0.222, 0.309, 0.402, 0.5, 0.598, 0.691, 0.778, 0.854, 0.916, 0.962, 0.99, 1.0],
    ("cars", "learned"): [1.0, 0.0, 0.0, 0.737, 0.0, 0.0, 0.834, 1.0, 0.261, 0.0, 0.205, 1.0, 0.908, 0.0, 0.268, 1.0],
}

ATTENUATION = {"gender": 1.0, "ids": 0.7, "cars": 0.7}
NOISE_EPS = {"gender": 4.0, "ids": 2.0, "cars": 4.0}
# quirk preserved from the reference matrix: ours_linear_noise_cars uses 2.0
NOISE_EPS_OVERRIDE = {("cars", "linear"): 2.0}

AVAE_KERNEL = {"gender": 8, "ids": 2, "cars": 4}
NDVAE_PARAMS = {
    "gender": dict(noise_std=0.1, x_channels=3, pre_proc_groups=2,
                   encoding_channels=16, scales=2, groups=4, cells=2),
    "ids": dict(noise_std=0.05, x_channels=3, pre_proc_groups=2,
                encoding_channels=32, scales=1, groups=8, cells=2),
    "cars": dict(noise_std=0.1, x_channels=3, pre_proc_groups=2,
                 encoding_channels=16, scales=2, groups=2, cells=4),
}

PATH = "/add/your/path"


def generate(out_dir: Path):
    out_dir.mkdir(parents=True, exist_ok=True)
    configs = {}
    for exp in EXPERIMENTS:
        configs[f"no_defense_{exp}.yaml"] = {"classifier_path": PATH}
        configs[f"competitor_trades_{exp}.yaml"] = {"classifier_path": PATH}
        for t in ("noise", "blur"):
            configs[f"ablation_{t}_{exp}.yaml"] = {
                "classifier_path": PATH, "type": t}
        configs[f"competitor_avae_{exp}.yaml"] = {
            "classifier_path": PATH, "autoencoder_path": PATH,
            "kernel_size": AVAE_KERNEL[exp]}
        configs[f"competitor_ndvae_{exp}.yaml"] = {
            "classifier_path": PATH, "autoencoder_path": PATH,
            **NDVAE_PARAMS[exp]}
        for sched in ("linear", "cosine", "learned"):
            for pre in ("no_preprocessing", "noise", "blur"):
                eps = 0.0
                if pre == "noise":
                    eps = NOISE_EPS_OVERRIDE.get((exp, sched), NOISE_EPS[exp])
                configs[f"ours_{sched}_{pre}_{exp}.yaml"] = {
                    "classifier_path": PATH, "autoencoder_path": PATH,
                    "interpolation_alphas": ALPHAS[(exp, sched)],
                    "alpha_attenuation": ATTENUATION[exp],
                    "initial_noise_eps": eps,
                    "gaussian_blur_input": pre == "blur"}
    for name, cfg in configs.items():
        (out_dir / name).write_text(yaml.safe_dump(cfg, sort_keys=False))
    return len(configs)


if __name__ == "__main__":
    dest = Path(sys.argv[1]) if len(sys.argv) > 1 else Path(__file__).parent
    n = generate(dest)
    print(f"wrote {n} configs to {dest}")
