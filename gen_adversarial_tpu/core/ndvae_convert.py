"""torch -> Flax converter for the ND-VAE competitor (reference
nd_vae/modules/models/NVAE.py module tree).

Note: the reference's decoder `h` constant is constructed as
nn.Parameter(...).unsqueeze(0), which yields a plain (non-parameter) tensor
(NVAE.py:490) - it is therefore neither trained nor saved in checkpoints.
The flax model keeps `h` as a real parameter; conversion leaves it at its
initialized value, which matches the reference's load-time behavior
(random h)."""

import numpy as np

from gen_adversarial_tpu.core.torch_convert import take_bn, take_conv, take_linear


def _se(sd, prefix):
    return {"fc1": take_linear(sd, f"{prefix}.se.0"),
            "fc2": take_linear(sd, f"{prefix}.se.2")}


def _residual_cell(sd, prefix, stride):
    p, s = {}, {}
    p["bn1"], s["bn1"] = take_bn(sd, f"{prefix}.bn1")
    p["conv1"] = take_conv(sd, f"{prefix}.conv1")
    p["bn2"], s["bn2"] = take_bn(sd, f"{prefix}.bn2")
    p["conv2"] = take_conv(sd, f"{prefix}.conv2")
    p["se"] = _se(sd, f"{prefix}.squeeze_excitation")
    if stride == 2:
        p["skip"] = {f"conv_{i}": take_conv(sd, f"{prefix}.skip.conv_{i}")
                     for i in (1, 2, 3, 4)}
    return p, s


def _generative_cell(sd, prefix, upsample=False):
    p, s = {}, {}
    p["bn1"], s["bn1"] = take_bn(sd, f"{prefix}.bn1")
    p["expand"] = take_conv(sd, f"{prefix}.expand")
    p["bn_expanded1"], s["bn_expanded1"] = take_bn(sd, f"{prefix}.bn_expanded1")
    p["dw"] = take_conv(sd, f"{prefix}.dep_sep_conv.depthwise")
    p["pw"] = take_conv(sd, f"{prefix}.dep_sep_conv.pointwise")
    p["bn_expanded2"], s["bn_expanded2"] = take_bn(sd, f"{prefix}.bn_expanded2")
    p["expand2"] = take_conv(sd, f"{prefix}.expand2")
    p["bn2"], s["bn2"] = take_bn(sd, f"{prefix}.bn2")
    p["se"] = _se(sd, f"{prefix}.squeeze_excitation")
    if upsample:
        p["skip_conv"] = take_conv(sd, f"{prefix}.skip.1")
    return p, s


def convert_ndvae(sd: dict, model) -> dict:
    """state dict -> DefenceNVAE variables; `model` supplies the config."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params, stats = {}, {}
    params["stem"] = take_conv(sd, "stem")

    i = 0
    for g in range(model.pre_proc_groups):
        for c in range(model.cells):
            stride = 2 if c == model.cells - 1 else 1
            p, s = _residual_cell(sd, f"pre_proc.tower.{g}.{c}", stride)
            params[f"pre_cells_{i}"], stats[f"pre_cells_{i}"] = p, s
            i += 1

    for s_ in range(model.scales):
        j = 0
        for g in range(model.groups):
            for c in range(model.cells):
                p, st = _residual_cell(sd, f"encoder.enc_tower.{s_}.{g}.{c}", 1)
                params[f"enc_scales_{s_}_{j}"] = p
                stats[f"enc_scales_{s_}_{j}"] = st
                j += 1
        if s_ < model.scales - 1:
            p, st = _residual_cell(sd, f"encoder.enc_tower.{s_}.{model.groups}", 2)
            params[f"enc_scales_{s_}_{j}"] = p
            stats[f"enc_scales_{s_}_{j}"] = st

    n_enc_comb = model.scales
    for idx in range(n_enc_comb):
        params[f"enc_combiners_{idx}"] = take_conv(sd, f"encoder.combiner_cells.{idx}.conv")
    for idx in range(model.scales + 1):
        params[f"dec_combiners_{idx}"] = take_conv(sd, f"decoder.combiner_cells.{idx}.conv")
        params[f"samplers_{idx}"] = {
            "cell": take_conv(sd, f"decoder.samplers.{idx}.cell"),
            "prior_conv": take_conv(sd, f"decoder.samplers.{idx}.prior_cell.1")}

    for s_ in range(model.scales):
        for g in range(model.groups):
            for c in range(model.cells):
                p, st = _generative_cell(sd, f"decoder.dec_tower.{s_}.{g}.group.{c}")
                params[f"dec_mods_{s_}_{g}_0_{c}"] = p
                stats[f"dec_mods_{s_}_{g}_0_{c}"] = st
            params[f"dec_mods_{s_}_{g}_1"] = take_conv(
                sd, f"decoder.dec_tower.{s_}.{g}.combiner.conv")
        if s_ != 0:
            p, st = _generative_cell(sd, f"decoder.dec_tower.{s_}.{model.groups}",
                                     upsample=True)
            params[f"dec_mods_{s_}_{model.groups}"] = p
            stats[f"dec_mods_{s_}_{model.groups}"] = st

    i = 0
    for b in range(model.pre_proc_groups):
        for c in range(model.cells):
            p, st = _generative_cell(sd, f"post_proc.tower.{i}", upsample=(c == 0))
            params[f"post_cells_{i}"], stats[f"post_cells_{i}"] = p, st
            i += 1

    params["image_conditional_conv"] = take_conv(sd, "image_conditional.1")

    # h: flax-initialized (see module docstring); take shape from the model
    import jax
    h_scaling = 2 ** (model.scales + 1)
    r = max(model.input_dim // h_scaling, 4)
    enc_out = model.encoding_channels * (2 ** model.pre_proc_groups) * \
        (2 ** (model.scales - 1))
    params["h"] = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(0), (1, r, r, enc_out)))

    return {"params": params, "batch_stats": stats}
