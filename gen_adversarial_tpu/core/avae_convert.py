"""torch -> Flax converter for the A-VAE StyledGenerator / Discriminator
(reference a_vae/{model.py,modules.py} module tree; EqualLR renames weights
to `weight_orig` with the scale applied at call time in both frameworks, so
weights copy over unchanged)."""

import numpy as np

from gen_adversarial_tpu.models.avae.model import avae_generator_plan


def _eq_conv(sd, prefix):
    return {"weight": np.transpose(np.asarray(sd[f"{prefix}.conv.weight_orig"]),
                                   (2, 3, 1, 0)),
            "bias": np.asarray(sd[f"{prefix}.conv.bias"])}


def _eq_linear(sd, prefix):
    return {"weight": np.transpose(np.asarray(sd[f"{prefix}.linear.weight_orig"])),
            "bias": np.asarray(sd[f"{prefix}.linear.bias"])}


def _noise(sd, prefix):
    return {"weight": np.transpose(np.asarray(sd[f"{prefix}.weight_orig"]),
                                   (0, 2, 3, 1))}


def _adain(sd, prefix):
    return {"style": _eq_linear(sd, f"{prefix}.style")}


def _encode_block(sd, prefix):
    return {"conv1": _eq_conv(sd, f"{prefix}.conv1"),
            "conv2": _eq_conv(sd, f"{prefix}.conv2")}


def _styled_block(sd, prefix, initial, upsample, fused):
    p = {}
    if initial:
        p["const_input"] = np.transpose(np.asarray(sd[f"{prefix}.conv1.input"]),
                                        (0, 2, 3, 1))
    elif upsample and fused:
        # FusedUpsample stores (in, out, k, k)
        p["conv1_fused"] = {
            "weight": np.transpose(np.asarray(sd[f"{prefix}.conv1.0.weight"]),
                                   (2, 3, 0, 1)),
            "bias": np.asarray(sd[f"{prefix}.conv1.0.bias"])}
    elif upsample:
        p["conv1"] = _eq_conv(sd, f"{prefix}.conv1.1")
    else:
        p["conv1"] = _eq_conv(sd, f"{prefix}.conv1")
    p["noise1"] = _noise(sd, f"{prefix}.noise1")
    p["adain1"] = _adain(sd, f"{prefix}.adain1")
    p["conv2"] = _eq_conv(sd, f"{prefix}.conv2")
    p["noise2"] = _noise(sd, f"{prefix}.noise2")
    p["adain2"] = _adain(sd, f"{prefix}.adain2")
    return p


def convert_avae(sd: dict, image_size: int) -> dict:
    """StyledGenerator state dict (the EMA g_running checkpoint the defense
    loads, load_defense.py:97-100) -> flax variables."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params = {"encoder": {}, "generator": {}}
    for blk in ("conv2", "conv3", "conv4"):
        params["encoder"][blk] = _encode_block(sd, f"encoder.{blk}")

    plan = avae_generator_plan(image_size)
    for i, (in_ch, out_ch, initial, upsample, fused) in enumerate(plan):
        params["generator"][f"progression_{i}"] = _styled_block(
            sd, f"generator.progression.{i}", initial, upsample, fused)
    params["generator"]["to_rgb"] = _eq_conv(sd, "generator.to_rgb")

    # style MLP: EqualLinears at Sequential indices 1,3,5,7 (model.py:117-125)
    for j, idx in enumerate((1, 3, 5, 7)):
        params[f"style_layers_{j}"] = _eq_linear(sd, f"style.{idx}")
    return {"params": params}
