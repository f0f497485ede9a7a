"""NVAE training regularizers (reference NVAE/model.py:333-447 in
SerezD/gen_adversarial): spectral regularization of all conv kernels via
power iteration (grouped by shape for batched matvecs on the MXU) and the
batch-norm max|scale| penalty.

Functional re-design: the reference mutates self.sr_u/self.sr_v module
state; here the singular-vector estimates are an explicit pytree threaded
through the train step (init -> update -> loss), jit-friendly.
"""

from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np
from flax.traverse_util import flatten_dict


def _conv_matrices(params) -> dict:
    """Group every conv kernel (HWIO) as rows of a (N, out, in*kh*kw) batch
    per flattened shape (model.py:383-389 groups torch (c, xyz) weights)."""
    groups = defaultdict(list)
    for path, leaf in flatten_dict(params, sep="/").items():
        if path.endswith("kernel") and getattr(leaf, "ndim", 0) == 4:
            kh, kw, cin, cout = leaf.shape
            w = jnp.transpose(leaf, (3, 0, 1, 2)).reshape(cout, kh * kw * cin)
            groups[w.shape].append(w)
    return {shape: jnp.stack(ws) for shape, ws in groups.items()}


def init_sr_state(params, key, num_power_iter: int = 4) -> dict:
    """Initialize left/right singular-vector estimates (normalized gaussian,
    model.py:404-417), then warm them up with 10x the per-step power
    iterations exactly like the reference does the first time a weight
    shape is seen (model.py:418-421: `num_iter = 10 * self.num_power_iter`
    when the shape is not yet in sr_u) - without it the first training
    steps regularize a badly under-converged sigma estimate."""
    state = {}
    for shape, w in _conv_matrices(params).items():
        n, r, c = w.shape
        key, k1, k2 = jax.random.split(key, 3)
        u = jax.random.normal(k1, (n, r))
        v = jax.random.normal(k2, (n, c))
        u = u / jnp.maximum(jnp.linalg.norm(u, axis=1, keepdims=True), 1e-3)
        v = v / jnp.maximum(jnp.linalg.norm(v, axis=1, keepdims=True), 1e-3)
        w_sg = jax.lax.stop_gradient(w)
        for _ in range(10 * num_power_iter - num_power_iter):
            v = jnp.einsum("nr,nrc->nc", u, w_sg)
            v = v / jnp.maximum(jnp.linalg.norm(v, axis=1, keepdims=True), 1e-3)
            u = jnp.einsum("nrc,nc->nr", w_sg, v)
            u = u / jnp.maximum(jnp.linalg.norm(u, axis=1, keepdims=True), 1e-3)
        state[shape] = {"u": u, "v": v}
    return state


def spectral_norm_loss(params, sr_state: dict, num_power_iter: int = 4):
    """sum of estimated largest singular values over all conv kernels
    (model.py:391-436).  Power-iteration updates run under stop_gradient
    (the reference's no_grad block); gradients flow through the final
    u^T W v bilinear form only.  Returns (loss, new_sr_state)."""
    loss = 0.0
    new_state = {}
    for shape, w in _conv_matrices(params).items():
        st = sr_state[shape]
        u, v = st["u"], st["v"]
        w_sg = jax.lax.stop_gradient(w)
        for _ in range(num_power_iter):
            v = jnp.einsum("nr,nrc->nc", u, w_sg)
            v = v / jnp.maximum(jnp.linalg.norm(v, axis=1, keepdims=True), 1e-3)
            u = jnp.einsum("nrc,nc->nr", w_sg, v)
            u = u / jnp.maximum(jnp.linalg.norm(u, axis=1, keepdims=True), 1e-3)
        u = jax.lax.stop_gradient(u)
        v = jax.lax.stop_gradient(v)
        sigma = jnp.einsum("nr,nrc,nc->n", u, w, v)
        loss = loss + jnp.sum(sigma)
        new_state[shape] = {"u": u, "v": v}
    return loss, new_state


def batch_norm_loss(params) -> jnp.ndarray:
    """sum over BN layers of max|scale| (model.py:438-447)."""
    loss = 0.0
    for path, leaf in flatten_dict(params, sep="/").items():
        if path.endswith("/scale") or path == "scale":
            loss = loss + jnp.max(jnp.abs(leaf))
    return loss
