"""Defense factory: YAML config -> defense model + attack suite (the
reference's load_defense.py:17-146 in SerezD/gen_adversarial).

Checkpoint paths in the YAML point at converted flax msgpack files (see
tools/convert_checkpoints.py); everything else (attack hyperparameters,
classifier/MLVGM class per experiment) is selected exactly like the
reference.
"""

from dataclasses import dataclass, field
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from gen_adversarial_tpu.core.config import (
    DefenseConfig, AttackSuiteConfig, ATTACK_SUITES, IMAGE_SIZE, N_CLASSES,
    defense_type_of, experiment_of)
from gen_adversarial_tpu.core.checkpoint import load_variables
from gen_adversarial_tpu.defenses.base import (
    ClassifierDefense, MLVGMDefense, make_classifier_fn)
from gen_adversarial_tpu.defenses.ablations import (
    GaussianNoiseDefense, GaussianBlurDefense)
from gen_adversarial_tpu.defenses.competitors import AVaeDefense, NDVaeDefense
from gen_adversarial_tpu.defenses.eot import eot_wrap
from gen_adversarial_tpu.defenses.purify import (
    make_e4e_purify, make_nvae_purify, make_trans_purify)
from gen_adversarial_tpu.models.classifiers import make_classifier
from gen_adversarial_tpu.attacks import deepfool_attack, cw_attack, autoattack

CLASSIFIER_TYPE = {"gender": "resnet", "ids": "vgg", "cars": "resnext"}


@dataclass
class LoadedDefense:
    experiment: str
    defense_type: str
    image_size: int
    n_classes: int
    defense: object                  # callable(key, x, preds_only)
    net: Callable                    # EoT-wrapped (key, x) -> logits
    attacks: dict                    # name -> callable(key, net, x, y)
    get_purified: Callable           # (key, x) -> purified images


def build_attacks(experiment: str, n_classes: int) -> dict:
    """The per-experiment attack dict (load_defense.py:32-36,48-52,64-68)."""
    s: AttackSuiteConfig = ATTACK_SUITES[experiment]
    return {
        "deepfool": partial(deepfool_attack, num_classes=s.deepfool_num_classes,
                            overshoot=s.deepfool_overshoot,
                            max_iter=s.deepfool_max_iter),
        "c&w": partial(cw_attack, c=s.cw_c, kappa=s.cw_kappa, steps=s.cw_steps,
                       lr=s.cw_lr, n_restarts=s.cw_n_restarts,
                       early_stopping_steps=s.cw_early_stopping_steps),
        "autoattack": partial(autoattack, n_classes=n_classes),
    }


def load_classifier_fn(experiment: str, path: str):
    model = make_classifier(CLASSIFIER_TYPE[experiment], N_CLASSES[experiment])
    variables, _ = load_variables(path)
    return make_classifier_fn(model, variables)


def load_defense(config_path: str, eot_steps: int = 32,
                 eot_chunk: int | None = None) -> LoadedDefense:
    """Build the defense named by a YAML config file (the config family name
    encodes defense_type and experiment, e.g. ours_cosine_noise_cars.yaml)."""
    cfg = DefenseConfig.from_yaml(config_path)
    defense_type = defense_type_of(config_path)
    experiment = experiment_of(config_path)
    image_size = IMAGE_SIZE[experiment]
    n_classes = N_CLASSES[experiment]

    classifier_fn = load_classifier_fn(experiment, cfg.classifier_path)
    attacks = build_attacks(experiment, n_classes)

    if defense_type in ("base", "trades"):
        defense = ClassifierDefense(classifier_fn)
        net = lambda key, x: defense(key, x)
        return LoadedDefense(experiment, defense_type, image_size, n_classes,
                             defense, net, attacks, defense.get_purified)

    if defense_type == "ablation":
        if cfg.type == "noise":
            defense = GaussianNoiseDefense(
                classifier_fn, eps=2.0 if experiment == "ids" else 4.0)
        else:
            defense = GaussianBlurDefense(classifier_fn, image_size)
    elif defense_type == "A-VAE":
        from gen_adversarial_tpu.models.avae.model import StyledGenerator
        model = StyledGenerator(image_size)
        variables, _ = load_variables(cfg.autoencoder_path)
        defense = AVaeDefense(model, variables, classifier_fn, cfg.kernel_size)
    elif defense_type == "ND-VAE":
        from gen_adversarial_tpu.models.ndvae.model import DefenceNVAE
        model = DefenceNVAE(
            x_channels=cfg.x_channels, encoding_channels=cfg.encoding_channels,
            pre_proc_groups=cfg.pre_proc_groups, scales=cfg.scales,
            groups=cfg.groups, cells=cfg.cells, input_dim=image_size)
        variables, _ = load_variables(cfg.autoencoder_path)
        defense = NDVaeDefense(model, variables, classifier_fn, cfg.noise_std)
    elif defense_type == "ours":
        # attenuation pre-applied (abstract_models.py:107)
        alphas = jnp.asarray(cfg.interpolation_alphas) * cfg.alpha_attenuation
        variables, meta = load_variables(cfg.autoencoder_path)
        if experiment == "gender":
            from gen_adversarial_tpu.models.e4e.psp import PSP
            model = PSP(stylegan_size=1024)
            purify = make_e4e_purify(model, variables, alphas)
            normalize = True
        elif experiment == "ids":
            from gen_adversarial_tpu.models.nvae.model import NVAE, NVAEConfig
            nv_cfg = NVAEConfig(**meta["config"]) if "config" in meta else NVAEConfig()
            model = NVAE(nv_cfg)
            purify = make_nvae_purify(model, variables, alphas)
            normalize = False
        else:  # cars
            from gen_adversarial_tpu.models.style_transformer.model import StyleTransformer
            model = StyleTransformer(output_size=256)
            purify = make_trans_purify(model, variables, alphas)
            normalize = True
        defense = MLVGMDefense(
            purify_fn=purify, classifier_fn=classifier_fn, image_size=image_size,
            initial_noise_eps=cfg.initial_noise_eps,
            apply_blur=cfg.gaussian_blur_input,
            normalize_before_purify=normalize)
    else:
        raise NotImplementedError(defense_type)

    net = eot_wrap(defense, eot_steps, chunk=eot_chunk)
    return LoadedDefense(experiment, defense_type, image_size, n_classes,
                         defense, net, attacks, defense.get_purified)
