"""JAX-native exact Gaussian Process + Expected Improvement, replacing the
reference's botorch SingleTaskGP/EI stack (alpha_learning/
bayesian_optimization.py:79-116 in SerezD/gen_adversarial) with a
dependency-free implementation: Matern-5/2 ARD kernel, Gaussian likelihood,
MLL fitting with Adam, and multi-restart EI maximization under box bounds.

The GP is tiny (tens of points) so everything runs comfortably on host CPU
or a sliver of the TPU; the expensive part - the objective - stays a jitted
EoT defense epoch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax


def matern52(x1, x2, lengthscales, outputscale):
    """Matern 5/2 ARD kernel. x1 (N,D), x2 (M,D) -> (N,M)."""
    d = (x1[:, None, :] - x2[None, :, :]) / lengthscales
    r = jnp.sqrt(jnp.sum(d ** 2, axis=-1) + 1e-12)
    sqrt5r = jnp.sqrt(5.0) * r
    return outputscale * (1 + sqrt5r + 5.0 / 3.0 * r ** 2) * jnp.exp(-sqrt5r)


def _unpack(params):
    # noise floor 1e-4 like gpytorch's GaussianLikelihood constraint
    # (GreaterThan(1e-4)) the reference's botorch SingleTaskGP relies on:
    # float32 Cholesky of a near-duplicate-row kernel goes silently NaN
    # below that (botorch additionally runs in float64)
    return (jax.nn.softplus(params["raw_ls"]) + 1e-4,
            jax.nn.softplus(params["raw_os"]) + 1e-4,
            jax.nn.softplus(params["raw_noise"]) + 1e-4,
            params["mean"])


def _kernel_with_jitter(x, ls, os_, noise):
    n = x.shape[0]
    # jitter scales with the signal variance (kernel diag = outputscale)
    return matern52(x, x, ls, os_) + (noise + 1e-6 * os_) * jnp.eye(n)


def neg_mll(params, x, y):
    ls, os_, noise, mean = _unpack(params)
    n = x.shape[0]
    k = _kernel_with_jitter(x, ls, os_, noise)
    chol = jnp.linalg.cholesky(k)
    resid = y - mean
    alpha = jax.scipy.linalg.cho_solve((chol, True), resid)
    return (0.5 * resid @ alpha + jnp.sum(jnp.log(jnp.diag(chol)))
            + 0.5 * n * jnp.log(2 * jnp.pi))


def fit_gp(x: jnp.ndarray, y: jnp.ndarray, steps: int = 200, lr: float = 0.05):
    """Fit hyperparameters by maximizing the exact marginal likelihood."""
    d = x.shape[1]
    params = {"raw_ls": jnp.zeros((d,)), "raw_os": jnp.asarray(0.54),
              "raw_noise": jnp.asarray(-4.0), "mean": jnp.mean(y)}
    tx = optax.adam(lr)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        loss, g = jax.value_and_grad(neg_mll)(params, x, y)
        updates, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, updates), opt, loss

    import numpy as np
    good = params
    for _ in range(steps):
        params, opt, loss = step(params, opt)
        if not np.isfinite(float(loss)):
            return good  # revert to the last finite iterate (float32
            # Cholesky can NaN without raising; a NaN fit would silently
            # corrupt every subsequent BO proposal)
        good = params
    return params


def gp_posterior(params, x_train, y_train, x_test):
    ls, os_, noise, mean = _unpack(params)
    k = _kernel_with_jitter(x_train, ls, os_, noise)
    chol = jnp.linalg.cholesky(k)
    k_star = matern52(x_test, x_train, ls, os_)
    alpha = jax.scipy.linalg.cho_solve((chol, True), y_train - mean)
    mu = mean + k_star @ alpha
    v = jax.scipy.linalg.solve_triangular(chol, k_star.T, lower=True)
    var = jnp.clip(os_ - jnp.sum(v ** 2, axis=0), 1e-10)
    return mu, var


def expected_improvement(params, x_train, y_train, x_test, best_f,
                         minimize: bool = True):
    """EI for minimization (the reference minimizes 1-accuracy)."""
    mu, var = gp_posterior(params, x_train, y_train, x_test)
    sigma = jnp.sqrt(var)
    imp = (best_f - mu) if minimize else (mu - best_f)
    z = imp / sigma
    cdf = 0.5 * (1 + jax.scipy.special.erf(z / jnp.sqrt(2.0)))
    pdf = jnp.exp(-0.5 * z ** 2) / jnp.sqrt(2 * jnp.pi)
    return imp * cdf + sigma * pdf


def optimize_acqf(key, params, x_train, y_train, best_f, bounds,
                  num_restarts: int = 8, raw_samples: int = 32,
                  steps: int = 60, lr: float = 0.05):
    """Multi-restart EI maximization under box bounds (the reference's
    botorch optimize_acqf(q=1, num_restarts=8, raw_samples=32))."""
    d = x_train.shape[1]
    lo, hi = bounds
    raw = jax.random.uniform(key, (raw_samples, d)) * (hi - lo) + lo
    ei_raw = expected_improvement(params, x_train, y_train, raw, best_f)
    top = jnp.argsort(-ei_raw)[:num_restarts]
    starts = raw[top]

    def neg_ei(z):
        return -expected_improvement(params, x_train, y_train, z[None],
                                     best_f)[0]

    tx = optax.adam(lr)

    @jax.jit
    def refine(z0):
        opt = tx.init(z0)

        def body(carry, _):
            z, opt = carry
            g = jax.grad(neg_ei)(z)
            updates, opt = tx.update(g, opt, z)
            z = jnp.clip(optax.apply_updates(z, updates), lo, hi)
            return (z, opt), None

        (z, _), _ = jax.lax.scan(body, (z0, opt), None, length=steps)
        return z, -neg_ei(z)

    zs, eis = jax.vmap(refine)(starts)
    best = jnp.argmax(eis)
    return zs[best], eis[best]


def bayesian_optimize(objective, n_alphas: int, n_steps: int,
                      seed_points: list | None = None, seed: int = 0,
                      log_fn=print, results_folder: str | None = None,
                      resume: bool = True,
                      fingerprint_extra: dict | None = None):
    """The full BO loop (bayesian_optimization.py:50-124): 5 seed schedules,
    GP refit + EI candidate each step; minimizes 1 - accuracy.  Returns
    (all_alphas (N,D), all_accuracies (N,1)).

    With results_folder set, every evaluated point is checkpointed (in the
    final alphas.npy/accuracies.npy format) and a re-run resumes after the
    last evaluated point with an identical PRNG stream — both the
    search-side key AND (via the objective's fast_forward hook, see
    grid._fast_forward) the objective's own EoT noise keys - each
    objective() call is a full EoT epoch over the adversarial set, so a
    crashed search keeps everything already paid for and the resumed run is
    seed-reproducible end to end.

    `fingerprint_extra`: objective-identifying fields folded into the
    resume fingerprint (see grid_search)."""
    from pathlib import Path

    from gen_adversarial_tpu.search.alphas import get_linear_alphas, get_cosine_alphas
    from gen_adversarial_tpu.search.grid import (
        _fast_forward, load_search_progress, save_search_step)

    if seed_points is None:
        seed_points = [
            get_cosine_alphas(n_alphas),
            get_linear_alphas(n_alphas),
            [0.5] * n_alphas,
            [1 - a for a in get_linear_alphas(n_alphas)],
            [1 - a for a in get_cosine_alphas(n_alphas)],
        ]
    n_seed = len(seed_points)
    folder = Path(results_folder) if results_folder is not None else None
    fingerprint = {"mode": "bo", "n_alphas": n_alphas, "n_steps": n_steps,
                   "seed": seed, "n_seed": n_seed,
                   **(fingerprint_extra or {})}
    rows, acc_rows, done, marker = ([], [], 0, {}) if not resume else \
        load_search_progress(folder, fingerprint, "bo_progress.json", log_fn)
    if done and (len(marker.get("ys", [])) != done or not np.allclose(
            np.stack(rows[:min(done, n_seed)]),
            np.stack([np.asarray(p, np.float64)
                      for p in seed_points[:min(done, n_seed)]]))):
        log_fn("[resume] saved rows do not match this run's seed schedules; "
               "restarting from scratch")
        rows, acc_rows, done, marker = [], [], 0, {}
    xs = [np.asarray(r, np.float64) for r in rows]
    # ys come from the marker, not 1-accuracies: the json float round-trip
    # is exact, so a resumed run's GP inputs are bit-identical
    ys = [float(v) for v in marker.get("ys", [])]
    _fast_forward(objective, done)

    def checkpoint():
        if folder is not None:
            save_search_step(folder, xs,
                             (1.0 - np.asarray(ys))[:, None].tolist(),
                             fingerprint, "bo_progress.json",
                             extra={"ys": ys})

    for p in [np.asarray(p, np.float64) for p in seed_points][done:n_seed]:
        acc = objective(p)
        xs.append(p)
        ys.append(1.0 - acc)
        log_fn(f"[bo seed] acc {acc:.4f}")
        checkpoint()

    key = jax.random.PRNGKey(seed)
    bounds = (jnp.zeros((n_alphas,)), jnp.ones((n_alphas,)))
    for s in range(max(0, done - n_seed)):
        key, _ = jax.random.split(key)  # replay completed steps' stream
    for s in range(max(0, done - n_seed), n_steps):
        x_train = jnp.asarray(np.stack(xs))
        y_train = jnp.asarray(np.asarray(ys))
        params = fit_gp(x_train, y_train)
        key, sub = jax.random.split(key)
        cand, ei = optimize_acqf(sub, params, x_train, y_train,
                                 float(np.min(ys)), bounds)
        acc = objective(np.asarray(cand))
        xs.append(np.asarray(cand, np.float64))
        ys.append(1.0 - acc)
        log_fn(f"[bo step {s}] EI {float(ei):.4f} acc {acc:.4f} "
               f"(best {1 - min(ys):.4f})")
        checkpoint()

    if folder is not None:
        (folder / "bo_progress.json").unlink(missing_ok=True)
    return np.stack(xs), 1.0 - np.asarray(ys)[:, None]
