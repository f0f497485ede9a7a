"""Typed configuration layer.

Unifies the reference's three config mechanisms (45 YAML files parsed into a
Namespace at load_defense.py:23-24, per-script argparse, and hardcoded
per-task dicts at load_defense.py:27-75) into one typed schema, while keeping
every one of the 45 YAML files loadable unchanged.
"""

from dataclasses import dataclass, field
from pathlib import Path

import yaml

EXPERIMENTS = ("gender", "ids", "cars")

# image side per experiment (load_defense.py:30,45,61)
IMAGE_SIZE = {"gender": 256, "ids": 64, "cars": 128}
# classes per experiment (loading_utils.py:10-34)
N_CLASSES = {"gender": 2, "ids": 100, "cars": 4}
# latent hierarchy depth per experiment (configs/*: 18 w-vectors for the
# 1024px StyleGAN (gender), 24 NVAE groups (ids), 16 w-vectors for the 512px
# StyleGAN (cars): n_latent = 2*log2(size) - 2)
N_LATENTS = {"gender": 18, "ids": 24, "cars": 16}


@dataclass(frozen=True)
class AttackSuiteConfig:
    """Per-experiment attack hyperparameters (load_defense.py:32-36,48-52,64-68)."""
    deepfool_num_classes: int
    deepfool_overshoot: float
    deepfool_max_iter: int
    cw_c: float
    cw_kappa: float
    cw_steps: int
    cw_lr: float
    cw_n_restarts: int
    cw_early_stopping_steps: int


ATTACK_SUITES = {
    "gender": AttackSuiteConfig(2, 0.01, 1024, 64.0, 0.01, 1024, 1e-3, 8, 32),
    "ids": AttackSuiteConfig(8, 0.02, 128, 16.0, 0.05, 1024, 5e-3, 8, 16),
    "cars": AttackSuiteConfig(4, 0.02, 256, 24.0, 0.02, 1024, 2e-3, 8, 16),
}


@dataclass
class DefenseConfig:
    """Schema covering every defense YAML in configs/ (see SURVEY.md 2.6)."""
    classifier_path: str = ""
    autoencoder_path: str = ""
    # 'ours'
    interpolation_alphas: list[float] = field(default_factory=list)
    alpha_attenuation: float = 1.0
    initial_noise_eps: float = 0.0
    gaussian_blur_input: bool = False
    # ablation
    type: str = ""  # 'noise' | 'blur'
    # A-VAE
    kernel_size: int = 0
    # ND-VAE
    noise_std: float = 0.0
    x_channels: int = 3
    pre_proc_groups: int = 2
    encoding_channels: int = 16
    scales: int = 2
    groups: int = 2
    cells: int = 4

    @classmethod
    def from_yaml(cls, path: str | Path) -> "DefenseConfig":
        with open(path, "r", encoding="utf-8") as f:
            raw = yaml.safe_load(f) or {}
        known = {k: v for k, v in raw.items() if k in cls.__dataclass_fields__}
        return cls(**known)


def defense_type_of(config_name: str) -> str:
    """Map a config file name to the defense_type flag the reference passes
    on the CLI (one of base/ablation/A-VAE/ND-VAE/trades/ours)."""
    stem = Path(config_name).stem
    if stem.startswith("no_defense"):
        return "base"
    if stem.startswith("ablation"):
        return "ablation"
    if stem.startswith("competitor_avae"):
        return "A-VAE"
    if stem.startswith("competitor_ndvae"):
        return "ND-VAE"
    if stem.startswith("competitor_trades"):
        return "trades"
    if stem.startswith("ours"):
        return "ours"
    raise ValueError(f"unknown config family: {config_name}")


def experiment_of(config_name: str) -> str:
    stem = Path(config_name).stem
    for exp in EXPERIMENTS:
        if stem.endswith("_" + exp):
            return exp
    raise ValueError(f"config name does not end in an experiment: {config_name}")
