"""Style-Transformer encoder: IR-SE-50 + FPN features cross-attended by 16
learned query tokens through three DETR-style decoder layers (reference
StyleGan_Trans/models/encoders/style_transformer_encoders.py and
models/transformer.py in SerezD/gen_adversarial), Flax / NHWC.
"""

import jax
import jax.numpy as jnp
from flax import linen as nn

from gen_adversarial_tpu.models.e4e.encoder import IRSE50Trunk, upsample_add


class TorchMHA(nn.Module):
    """Multi-head attention with torch.nn.MultiheadAttention's packed-qkv
    parameterization (so checkpoints convert 1:1).  Inputs are batch-first
    (B, L, D)."""
    num_heads: int

    @nn.compact
    def __call__(self, q, k, v):
        d = q.shape[-1]
        in_w = self.param("in_proj_weight", nn.initializers.xavier_uniform(),
                          (3 * d, d))
        in_b = self.param("in_proj_bias", nn.initializers.zeros, (3 * d,))
        out_w = self.param("out_proj_weight", nn.initializers.xavier_uniform(),
                           (d, d))
        out_b = self.param("out_proj_bias", nn.initializers.zeros, (d,))

        qp = q @ in_w[:d].T + in_b[:d]
        kp = k @ in_w[d:2 * d].T + in_b[d:2 * d]
        vp = v @ in_w[2 * d:].T + in_b[2 * d:]

        b, lq, _ = qp.shape
        lk = kp.shape[1]
        h = self.num_heads
        dh = d // h
        qp = qp.reshape(b, lq, h, dh).transpose(0, 2, 1, 3)
        kp = kp.reshape(b, lk, h, dh).transpose(0, 2, 1, 3)
        vp = vp.reshape(b, lk, h, dh).transpose(0, 2, 1, 3)
        attn = jax.nn.softmax(qp @ kp.transpose(0, 1, 3, 2) / jnp.sqrt(dh), axis=-1)
        out = (attn @ vp).transpose(0, 2, 1, 3).reshape(b, lq, d)
        return out @ out_w.T + out_b


class TransformerDecoderLayer(nn.Module):
    """DETR decoder layer, post-norm variant (transformer.py:42-64); dropout
    is identity at inference."""
    num_heads: int = 4
    dim_feedforward: int = 1024

    @nn.compact
    def __call__(self, tgt, memory):
        d = tgt.shape[-1]
        t2 = TorchMHA(self.num_heads, name="self_attn")(tgt, tgt, tgt)
        tgt = nn.LayerNorm(epsilon=1e-5, name="norm1")(tgt + t2)
        t2 = TorchMHA(self.num_heads, name="multihead_attn")(tgt, memory, memory)
        tgt = nn.LayerNorm(epsilon=1e-5, name="norm2")(tgt + t2)
        t2 = nn.Dense(self.dim_feedforward, name="linear1")(tgt)
        t2 = nn.Dense(d, name="linear2")(nn.relu(t2))
        return nn.LayerNorm(epsilon=1e-5, name="norm3")(tgt + t2)


class GradualStyleEncoder(nn.Module):
    """style_transformer_encoders.py:10-85: trunk + FPN + 3 decoder layers
    refining the learned query tokens coarse -> medium -> fine."""
    n_styles: int = 16

    def setup(self):
        self.trunk = IRSE50Trunk()
        self.latlayer1 = nn.Conv(512, (1, 1))
        self.latlayer2 = nn.Conv(512, (1, 1))
        self.layer_coarse = TransformerDecoderLayer()
        self.layer_medium = TransformerDecoderLayer()
        self.layer_fine = TransformerDecoderLayer()
        self.z = self.param("z", nn.initializers.normal(1.0),
                            (1, self.n_styles, 512))

    def __call__(self, x, query, train: bool = False):
        """x: (B,H,W,C) images; query: (B, n_styles, 512) style-MLP'd tokens."""
        c1, c2, c3 = self.trunk(x, train)
        p2 = upsample_add(c3, self.latlayer1(c2))
        p1 = upsample_add(p2, self.latlayer2(c1))

        def tokens(f):  # (B,H,W,C) -> (B, HW, C)
            b, h, w, c = f.shape
            # match torch's flatten(2) on NCHW: sequence ordered row-major
            return f.reshape(b, h * w, c)

        q = self.layer_coarse(query, tokens(c3))
        q = self.layer_medium(q, tokens(p2))
        q = self.layer_fine(q, tokens(p1))
        return q
