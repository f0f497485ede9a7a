"""Shared attack math, batched (the reference's src/attacks/utils.py:6-76
operates on batch-1 tensors; everything here carries an explicit batch dim)."""

import math

import jax
import jax.numpy as jnp
from jax import lax


def class_grads(net, key, x, class_idx=None, cotangent_chunk=None):
    """Per-sample gradients of selected logits from ONE forward.

    The reference's per-class `backward(retain_graph=True)` loops
    (DeepFool untargeted.py:529-545, FAB get_diff_logits_grads:605-635)
    become one jax.vjp linearization applied to one-hot cotangents - same
    forward randomness for every class gradient, exactly like the retained
    torch graph.

    class_idx: (B, K) class selectors, or None for all C classes.
    cotangent_chunk: if set, apply the vjp to blocks of this many
    cotangents sequentially (lax.map over chunks of an inner vmap)
    instead of one K-wide vmap.  The K-wide vmap holds K copies of the
    backward's intermediates live at once - for FAB on the 100-class ids
    task that capped the batch at 2 on a 16G chip; chunking trades that
    peak for sequential grade-steps so the image batch can grow (under
    remat each chunk recomputes the purifier forward, an ~K/chunk x
    forward overhead on a ~2K-forward-equivalent backward).  Results are
    numerically identical (tests/test_attacks.py pins it).
    Returns logits (B, C) and grads (K, B, ...) (K = C when None).
    """
    logits, vjp_fn = jax.vjp(lambda x_: net(key, x_), x)
    n_classes = logits.shape[1]
    if class_idx is None:
        eye = jnp.eye(n_classes, dtype=logits.dtype)
        cotangents = jnp.broadcast_to(
            eye[:, None, :], (n_classes, logits.shape[0], n_classes))
    else:
        cotangents = jax.nn.one_hot(class_idx.T, n_classes,
                                    dtype=logits.dtype)  # (K, B, C)
    k = cotangents.shape[0]
    if cotangent_chunk is not None and cotangent_chunk < k:
        c = int(cotangent_chunk)
        pad = (-k) % c
        if pad:  # pad with zero cotangents (their grads are discarded)
            cotangents = jnp.concatenate(
                [cotangents, jnp.zeros((pad,) + cotangents.shape[1:],
                                       cotangents.dtype)], axis=0)
        blocks = cotangents.reshape((k + pad) // c, c, *cotangents.shape[1:])
        grads = lax.map(lambda cts: jax.vmap(lambda ct: vjp_fn(ct)[0])(cts),
                        blocks)
        grads = grads.reshape(k + pad, *grads.shape[2:])[:k]
    else:
        grads = jax.vmap(lambda ct: vjp_fn(ct)[0])(cotangents)
    return logits, grads


def l2_norm(x: jnp.ndarray, keepdims: bool = False) -> jnp.ndarray:
    """Per-sample L2 norm over all non-batch axes. (B, ...) -> (B,) or
    (B, 1, ..., 1)."""
    axes = tuple(range(1, x.ndim))
    n = jnp.sqrt(jnp.sum(x ** 2, axis=axes))
    if keepdims:
        n = n.reshape((-1,) + (1,) * (x.ndim - 1))
    return n


def normalize(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Per-sample L2 normalization."""
    return x / jnp.maximum(l2_norm(x, keepdims=True), eps)


def projection_l2(points_to_project: jnp.ndarray, w_hyperplane: jnp.ndarray,
                  b_hyperplane: jnp.ndarray) -> jnp.ndarray:
    """Closed-form L2 projection of `points` onto {z : w.z = b} intersected
    with the [0,1] box, via sorting + fixed-trip binary search.

    Faithful translation of the reference's FAB helper (utils.py:22-76) with
    the in-place torch ops replaced by functional jnp updates; the
    data-dependent `if c4.any()` branches become masked selects.

    points/w: (N, D); b: (N, 1).  Returns d (N, D) with z* = point + d.
    """
    t, w, b = points_to_project, w_hyperplane, b_hyperplane
    n, d_dim = w.shape

    c = jnp.sum(w * t, axis=1) - b[:, 0]
    ind2 = 2.0 * (c >= 0) - 1.0
    w = w * ind2[:, None]
    c = c * ind2

    r = jnp.clip(jnp.maximum(t / w, (t - 1) / w), -1e12, 1e12)
    r = jnp.where(jnp.abs(w) < 1e-8, 1e12, r)
    r = jnp.where(r == -1e12, r * -1, r)
    indr = jnp.argsort(r, axis=1)
    rs = jnp.take_along_axis(r, indr, axis=1)
    rs2 = jnp.pad(rs[:, 1:], ((0, 0), (0, 1)))
    rs = jnp.where(rs == 1e12, 0, rs)
    rs2 = jnp.where(rs2 == 1e12, 0, rs2)

    w3s = jnp.take_along_axis(w ** 2, indr, axis=1)
    w5 = jnp.sum(w3s, axis=1, keepdims=True)
    ws = w5 - jnp.cumsum(w3s, axis=1)
    d = -(r * w)
    d = d * (jnp.abs(w) > 1e-8)
    s = jnp.concatenate(
        [-w5 * rs[:, 0:1],
         jnp.cumsum((-rs2 + rs) * ws, axis=1) - w5 * rs[:, 0:1]], axis=1)

    c4 = (s[:, 0] + c) < 0
    c3 = (jnp.sum(d * w, axis=1) + c) > 0
    c2 = ~(c4 | c3)

    # fixed-trip binary search over all rows (masked by c2 at the end)
    lb = jnp.zeros((n,), jnp.float32)
    ub = jnp.full((n,), float(d_dim - 1), jnp.float32)
    nitermax = int(math.ceil(math.log2(max(d_dim, 2))))

    def body(_, carry):
        lb_, ub_ = carry
        mid = jnp.floor((lb_ + ub_) / 2)
        mid_idx = mid.astype(jnp.int32)[:, None]
        sel = jnp.take_along_axis(s, mid_idx, axis=1)[:, 0]
        go_up = (sel + c) > 0
        return jnp.where(go_up, mid, lb_), jnp.where(go_up, ub_, mid)

    lb, ub = lax.fori_loop(0, nitermax, body, (lb, ub))
    lb_idx = lb.astype(jnp.int32)

    # c4 rows: pure hyperplane projection
    alpha_c4 = c / w5[:, 0]
    d_c4 = -alpha_c4[:, None] * w

    # c2 rows: box-constrained solution at the found breakpoint
    s_lb = jnp.take_along_axis(s, lb_idx[:, None], axis=1)[:, 0]
    ws_lb = jnp.take_along_axis(ws, lb_idx[:, None], axis=1)[:, 0]
    rs_lb = jnp.take_along_axis(rs, lb_idx[:, None], axis=1)[:, 0]
    alpha_c2 = jnp.where(ws_lb == 0, 0.0, (s_lb + c) / jnp.where(ws_lb == 0, 1.0, ws_lb) + rs_lb)
    c5 = (alpha_c2[:, None] > r).astype(w.dtype)
    d_c2 = d * c5 - alpha_c2[:, None] * w * (1 - c5)

    d = jnp.where(c4[:, None], d_c4, d)
    d = jnp.where(c2[:, None], d_c2, d)
    return d * (jnp.abs(w) > 1e-8)
