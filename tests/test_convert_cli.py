"""tools/convert_checkpoints.py end-to-end: fabricate reference-format torch
checkpoints, run the CLI, load the msgpack, and check output parity."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import torch

from tests.torch_refs import TVResNet, WrappedClassifier


REPO = Path(__file__).resolve().parents[1]


def run_cli(*args):
    return subprocess.run(
        [sys.executable, str(REPO / "tools" / "convert_checkpoints.py"), *args],
        capture_output=True, text=True, cwd=REPO)


def test_classifier_conversion_cli(tmp_path):
    torch.manual_seed(0)
    model = WrappedClassifier(TVResNet((3, 4, 6, 3), n_classes=2))
    for m in model.modules():
        if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm1d)):
            m.running_mean.normal_(0, 0.2)
            m.running_var.uniform_(0.6, 1.5)
    model.eval()
    src = tmp_path / "resnet.pt"
    # the reference's trainer checkpoint format (classifier/train.py:298-300)
    torch.save({"epoch": 5, "global_step": 100,
                "state_dict": model.state_dict()}, src)

    dst = tmp_path / "resnet.msgpack"
    res = run_cli("--kind", "classifier", "--model-type", "resnet",
                  "--src", str(src), "--dst", str(dst))
    assert res.returncode == 0, res.stderr[-2000:]
    assert dst.exists()

    from gen_adversarial_tpu.core.checkpoint import load_variables
    from gen_adversarial_tpu.models.classifiers import ResNet50
    variables, meta = load_variables(dst)
    assert meta["model_type"] == "resnet"

    x = np.random.RandomState(0).rand(2, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = model(torch.tensor(x)).numpy()
    fm = ResNet50(n_classes=2)
    got = fm.apply(jax.tree.map(jnp.asarray, variables),
                   jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)


def test_nvae_conversion_cli(tmp_path):
    """--kind nvae against the reference checkpoint format
    ({'configuration', 'state_dict_temp=t'}, loading_utils.py:51-66)."""
    from tests.reference_oracle import load_reference
    load_reference()
    from src.mlvgms_autoencoders.NVAE.model import AutoEncoder

    ae_args = {"initial_channels": 8, "num_pre-post_process_blocks": 1,
               "num_pre-post_process_cells": 2, "num_logistic_mixtures": 5,
               "num_scales": 2, "min_groups_per_scale": 1,
               "num_groups_per_scale": 2, "is_adaptive": True,
               "num_cells_per_group": 1, "num_latent_per_group": 4,
               "num_nf_cells": 1}
    torch.manual_seed(0)
    ae = AutoEncoder(ae_args, resolution=(3, 32, 32))
    for m in ae.modules():
        if isinstance(m, torch.nn.modules.batchnorm._BatchNorm):
            m.running_mean.normal_(0, 0.2)
            m.running_var.uniform_(0.6, 1.5)
    ae.eval()
    src = tmp_path / "nvae.pt"
    torch.save({"configuration": {"autoencoder": ae_args,
                                  "resolution": (3, 32, 32)},
                "state_dict_temp=0.6": ae.state_dict()}, src)

    dst = tmp_path / "nvae.msgpack"
    res = run_cli("--kind", "nvae", "--src", str(src), "--dst", str(dst),
                  "--temperature", "0.6")
    assert res.returncode == 0, res.stderr[-2000:]

    from gen_adversarial_tpu.core.checkpoint import load_variables
    from gen_adversarial_tpu.models.nvae.model import NVAE, NVAEConfig
    variables, meta = load_variables(dst)
    cfg = NVAEConfig(**meta["config"])
    model = NVAE(cfg)
    x = np.random.RandomState(0).rand(1, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        want = ae.reconstruct(torch.tensor(x), deterministic=True).numpy()
    got = model.apply(jax.tree.map(jnp.asarray, variables),
                      jnp.asarray(x.transpose(0, 2, 3, 1)),
                      jax.random.PRNGKey(0), True, method=NVAE.reconstruct)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               rtol=1e-3, atol=5e-4)


def test_e4e_conversion_cli(tmp_path):
    """--kind e4e against the pSp checkpoint format ({'state_dict' with
    encoder./decoder. prefixes, 'latent_avg', 'opts'}, psp.py:39-45)."""
    from argparse import Namespace
    from tests.reference_oracle import load_reference
    load_reference()
    from src.mlvgms_autoencoders.StyleGan_E4E.encoding.encoder import Encoder4Editing
    from src.mlvgms_autoencoders.StyleGan_E4E.stylegan2.generator import Generator as RefGen

    torch.manual_seed(1)
    size = 64
    enc = Encoder4Editing(50, "ir_se", Namespace(stylegan_size=size))
    gen = RefGen(size, 512, 8, channel_multiplier=2)
    for m in enc.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.2)
            m.running_var.uniform_(0.6, 1.5)
    enc.eval(); gen.eval()
    sd = {f"encoder.{k}": v for k, v in enc.state_dict().items()}
    sd.update({f"decoder.{k}": v for k, v in gen.state_dict().items()})
    latent_avg = torch.randn(2 * 6 - 2, 512)
    src = tmp_path / "e4e.pt"
    torch.save({"state_dict": sd, "latent_avg": latent_avg,
                "opts": {"stylegan_size": size}}, src)

    dst = tmp_path / "e4e.msgpack"
    res = run_cli("--kind", "e4e", "--src", str(src), "--dst", str(dst),
                  "--stylegan-size", str(size))
    assert res.returncode == 0, res.stderr[-2000:]

    from gen_adversarial_tpu.core.checkpoint import load_variables
    from gen_adversarial_tpu.models.e4e.psp import PSP
    variables, meta = load_variables(dst)
    model = PSP(stylegan_size=size)

    x = np.random.RandomState(2).rand(1, 3, 256, 256).astype(np.float32) * 2 - 1
    with torch.no_grad():
        codes_t = enc(torch.tensor(x)) + latent_avg[None]
        img_t, _ = gen([codes_t], input_is_latent=True, randomize_noise=False)
    codes_j = model.apply(jax.tree.map(jnp.asarray, variables),
                          jnp.asarray(x.transpose(0, 2, 3, 1)), method=PSP.encode)
    np.testing.assert_allclose(np.asarray(codes_j), codes_t.numpy(),
                               rtol=2e-3, atol=2e-3)
    img_j = model.apply(jax.tree.map(jnp.asarray, variables),
                        codes_t.numpy(), method=PSP.decode)
    # decode face-pools to 256; the reference decode path does too (psp.py:109-115)
    import torch.nn.functional as TF
    want = TF.adaptive_avg_pool2d(img_t, 256).numpy()
    np.testing.assert_allclose(np.asarray(img_j).transpose(0, 3, 1, 2), want,
                               rtol=3e-3, atol=3e-3)


def test_cli_help_of_all_entrypoints():
    """Every CLI module parses --help (argparse wiring smoke test)."""
    for mod in ("gen_adversarial_tpu.cli.test_defense",
                "gen_adversarial_tpu.cli.train_classifier",
                "gen_adversarial_tpu.cli.trades_finetune",
                "gen_adversarial_tpu.cli.train_avae",
                "gen_adversarial_tpu.cli.train_ndvae",
                "gen_adversarial_tpu.cli.alpha_search"):
        res = subprocess.run([sys.executable, "-m", mod, "--help"],
                             capture_output=True, text=True, cwd=REPO)
        assert res.returncode == 0, (mod, res.stderr[-500:])
