"""Defense factory: YAML config -> defense model + attack suite (the
reference's load_defense.py:17-146 in SerezD/gen_adversarial).

Checkpoint paths in the YAML point at converted flax msgpack files (see
tools/convert_checkpoints.py); everything else (attack hyperparameters,
classifier/MLVGM class per experiment) is selected exactly like the
reference.  Defenses come out as pytree dataclasses (defenses/base.py) so
the harness passes them as jit arguments - weights never become HLO
constants.
"""

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from gen_adversarial_tpu.core.config import (
    DefenseConfig, AttackSuiteConfig, ATTACK_SUITES, IMAGE_SIZE, N_CLASSES,
    defense_type_of, experiment_of)
from gen_adversarial_tpu.core.checkpoint import load_variables
from gen_adversarial_tpu.defenses.base import (
    ClassifierDefense, MLVGMDefense, make_classifier_apply)
from gen_adversarial_tpu.defenses.ablations import (
    GaussianNoiseDefense, GaussianBlurDefense)
from gen_adversarial_tpu.defenses.competitors import AVaeDefense, NDVaeDefense
from gen_adversarial_tpu.defenses.eot import eot_wrap
from gen_adversarial_tpu.defenses.purify import (
    make_e4e_purify_split, make_nvae_purify_split, make_trans_purify_split,
    _compose)
from gen_adversarial_tpu.models.classifiers import make_classifier
from gen_adversarial_tpu.attacks import deepfool_attack, cw_attack, autoattack

CLASSIFIER_TYPE = {"gender": "resnet", "ids": "vgg", "cars": "resnext"}


@dataclass
class LoadedDefense:
    experiment: str
    defense_type: str
    image_size: int
    n_classes: int
    defense: object                  # pytree dataclass: callable(key, x, preds_only)
    eot_steps: int
    eot_chunk: int | None
    attacks: dict                    # name -> callable(key, net, x, y)
    dtype: str = "float32"           # numeric setup, recorded for the
    # harness resume fingerprint (a bf16 and an f32 run must never merge)

    @property
    def net(self):
        """Convenience EoT-wrapped logits fn (closure form; for jitted use
        pass self.defense as an argument instead - see eval/harness.py)."""
        return eot_wrap(self.defense, self.eot_steps, chunk=self.eot_chunk)

    def get_purified(self, key, x):
        return self.defense.get_purified(key, x)


def build_attacks(experiment: str, n_classes: int) -> dict:
    """The per-experiment attack dict (load_defense.py:32-36,48-52,64-68)."""
    import os

    s: AttackSuiteConfig = ATTACK_SUITES[experiment]
    # GAT_DF_COT_CHUNK: sequential cotangent blocks for DeepFool's top-K
    # class jacobian — numerically identical (tests/test_attacks.py), trades
    # VJP live memory for eval batch size.  Measured 2026-08-20 on the ids
    # flagship: chunk 5 + batch 16 = 2.37 img*iter/s vs 1.83 at the
    # unchunked batch-4 point (+30%); keep OFF for small batches.
    df_cot = int(os.environ.get("GAT_DF_COT_CHUNK", "0")) or None
    return {
        "deepfool": partial(deepfool_attack, num_classes=s.deepfool_num_classes,
                            overshoot=s.deepfool_overshoot,
                            max_iter=s.deepfool_max_iter,
                            cotangent_chunk=df_cot),
        "c&w": partial(cw_attack, c=s.cw_c, kappa=s.cw_kappa, steps=s.cw_steps,
                       lr=s.cw_lr, n_restarts=s.cw_n_restarts,
                       early_stopping_steps=s.cw_early_stopping_steps),
        "autoattack": partial(autoattack, n_classes=n_classes),
    }


def load_classifier_parts(experiment: str, path: str):
    model = make_classifier(CLASSIFIER_TYPE[experiment], N_CLASSES[experiment])
    variables, _ = load_variables(path)
    return make_classifier_apply(model), variables


def load_defense(config_path: str, eot_steps: int = 32,
                 eot_chunk: int | None = None,
                 remat: bool | None = None,
                 remat_policy: str | None = None,
                 dtype: str | None = None) -> LoadedDefense:
    """Build the defense named by a YAML config file (the config family name
    encodes defense_type and experiment, e.g. ours_cosine_noise_cars.yaml).

    dtype='bfloat16' runs the purifier+classifier in bf16 (weights cast once,
    f32 boundary contract - see core/precision.defense_astype); attack math
    stays f32."""
    cfg = DefenseConfig.from_yaml(config_path)
    defense_type = defense_type_of(config_path)
    experiment = experiment_of(config_path)
    image_size = IMAGE_SIZE[experiment]
    n_classes = N_CLASSES[experiment]

    clf_apply, clf_vars = load_classifier_parts(experiment, cfg.classifier_path)
    attacks = build_attacks(experiment, n_classes)

    if defense_type in ("base", "trades"):
        # the reference leaves bare classifiers un-EoT-wrapped
        # (load_defense.py:78-82,126-130); EoT over a deterministic model is
        # a semantic no-op but costs 32x, so force 1 step
        defense = ClassifierDefense(clf_vars, clf_apply)
        eot_steps = 1
    elif defense_type == "ablation":
        if cfg.type == "noise":
            defense = GaussianNoiseDefense(
                clf_vars, clf_apply, eps=2.0 if experiment == "ids" else 4.0)
        else:
            defense = GaussianBlurDefense(clf_vars, clf_apply, image_size)
    elif defense_type == "A-VAE":
        from gen_adversarial_tpu.models.avae.model import StyledGenerator
        model = StyledGenerator(image_size)
        variables, _ = load_variables(cfg.autoencoder_path)
        defense = AVaeDefense(variables, clf_vars, model, clf_apply,
                              cfg.kernel_size)
    elif defense_type == "ND-VAE":
        from gen_adversarial_tpu.models.ndvae.model import DefenceNVAE
        model = DefenceNVAE(
            x_channels=cfg.x_channels, encoding_channels=cfg.encoding_channels,
            pre_proc_groups=cfg.pre_proc_groups, scales=cfg.scales,
            groups=cfg.groups, cells=cfg.cells, input_dim=image_size)
        variables, _ = load_variables(cfg.autoencoder_path)
        defense = NDVaeDefense(variables, clf_vars, model, clf_apply,
                               cfg.noise_std)
    elif defense_type == "ours":
        # attenuation pre-applied (abstract_models.py:107)
        alphas = jnp.asarray(cfg.interpolation_alphas) * cfg.alpha_attenuation
        variables, meta = load_variables(cfg.autoencoder_path)
        (encode_apply, decode_apply), normalize, transform = \
            _ours_components(experiment, meta)
        if remat is None:
            # the high-res StyleGAN purifiers OOM under class-jacobian
            # attacks without rematerialization; the 64px NVAE does not
            remat = experiment in ("gender", "cars")
        if remat_policy is not None:
            # a policy only takes effect under remat; asking for one
            # (e.g. --remat-policy on an ids config) implies remat
            remat = True
        defense = MLVGMDefense(
            purify_variables=transform(variables), classifier_variables=clf_vars,
            alphas=alphas, purify_apply=_compose(encode_apply, decode_apply),
            classifier_apply=clf_apply, image_size=image_size,
            purify_encode_apply=encode_apply, purify_decode_apply=decode_apply,
            initial_noise_eps=cfg.initial_noise_eps,
            apply_blur=cfg.gaussian_blur_input,
            normalize_before_purify=normalize, remat=remat,
            remat_policy=remat_policy)
    else:
        raise NotImplementedError(defense_type)

    if dtype is not None and dtype != "float32":
        from gen_adversarial_tpu.core.precision import defense_astype
        defense = defense_astype(defense, jnp.dtype(dtype))

    return LoadedDefense(experiment, defense_type, image_size, n_classes,
                         defense, eot_steps, eot_chunk, attacks,
                         dtype=dtype or "float32")


def _ours_components(experiment: str, meta: dict):
    """-> ((encode_apply, decode_apply), normalize_before_purify,
    variables_transform)."""
    identity = lambda v: v
    if experiment == "gender":
        from gen_adversarial_tpu.models.e4e.psp import PSP
        model = PSP(stylegan_size=1024)
        return make_e4e_purify_split(model), True, identity
    if experiment == "ids":
        from gen_adversarial_tpu.models.nvae.model import NVAE, NVAEConfig
        nv_cfg = NVAEConfig(**meta["config"]) if "config" in meta else NVAEConfig()
        # NOTE: models/nvae/scanned.py offers an exact-parity
        # scan-over-groups purify with a much smaller HLO; measured on v5e it
        # is a large RUNTIME pessimization under attack gradients (the scan
        # serializes tiny per-group kernels and materializes stacked
        # residuals: APGD-64 0.5s vs 7ms unrolled), so the unrolled tower
        # stays the default and scanned remains opt-in for
        # compile-time-constrained contexts.
        model = NVAE(nv_cfg)
        return make_nvae_purify_split(model), False, identity
    from gen_adversarial_tpu.models.style_transformer.model import StyleTransformer
    model = StyleTransformer(output_size=512)
    return make_trans_purify_split(model), True, identity


def load_ours_for_search(config_path: str):
    """For alpha search: load the 'ours' defense components once and return
    (experiment, image_size, make_defense) where make_defense(alphas) purely
    rebuilds the defense pytree for a new (already attenuated) alpha vector
    - traceable, so the search objective never retraces (AlphaEvaluator)."""
    cfg = DefenseConfig.from_yaml(config_path)
    assert defense_type_of(config_path) == "ours"
    experiment = experiment_of(config_path)
    image_size = IMAGE_SIZE[experiment]
    clf_apply, clf_vars = load_classifier_parts(experiment, cfg.classifier_path)
    variables, meta = load_variables(cfg.autoencoder_path)
    (encode_apply, decode_apply), normalize, transform = \
        _ours_components(experiment, meta)
    variables = transform(variables)

    def make_defense(alphas):
        return MLVGMDefense(
            purify_variables=variables, classifier_variables=clf_vars,
            alphas=jnp.asarray(alphas),
            purify_apply=_compose(encode_apply, decode_apply),
            classifier_apply=clf_apply, image_size=image_size,
            purify_encode_apply=encode_apply, purify_decode_apply=decode_apply,
            initial_noise_eps=0.0, apply_blur=False,
            normalize_before_purify=normalize)

    return experiment, image_size, make_defense
