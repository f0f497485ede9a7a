"""Alpha-search tests: schedules, grid search, and the JAX-native GP/EI
Bayesian optimization on a synthetic objective."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from gen_adversarial_tpu.search.alphas import (
    get_linear_alphas, get_cosine_alphas, get_best_combination)
from gen_adversarial_tpu.search.grid import grid_search
from gen_adversarial_tpu.search.gp import (
    fit_gp, gp_posterior, expected_improvement, bayesian_optimize)


def test_schedules():
    lin = get_linear_alphas(4)
    np.testing.assert_allclose(lin, [0.25, 0.5, 0.75, 1.0])
    cos = get_cosine_alphas(4)
    np.testing.assert_allclose(cos[-1], 1.0, atol=1e-9)
    assert all(b > a for a, b in zip(cos, cos[1:]))  # monotone


def test_grid_search_and_best_combination(tmp_path):
    target = np.array([0.3, 0.7])

    def objective(a):
        return float(1.0 - np.sum((a - target) ** 2))

    alphas, accs = grid_search(objective, 2, 32, results_folder=str(tmp_path),
                               log_fn=lambda s: None)
    assert alphas.shape == (32, 2) and accs.shape == (32, 1)
    best = get_best_combination(str(tmp_path))
    assert np.sum((best - target) ** 2) < 0.15


def test_gp_fits_and_predicts():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(20, 2))
    y = jnp.sin(3 * x[:, 0]) + 0.5 * x[:, 1]
    params = fit_gp(x, y, steps=150)
    mu, var = gp_posterior(params, x, y, x)
    # near-interpolation at training points
    assert float(jnp.max(jnp.abs(mu - y))) < 0.15
    assert float(jnp.max(var)) < 0.5
    ei = expected_improvement(params, x, y, x, best_f=float(y.min()))
    assert bool(jnp.all(ei >= -1e-6))


def test_bayesian_optimize_improves():
    target = np.full(4, 0.4)

    def objective(a):  # returns "accuracy" to maximize
        return float(np.exp(-4 * np.sum((np.asarray(a) - target) ** 2)))

    xs, accs = bayesian_optimize(objective, n_alphas=4, n_steps=6,
                                 log_fn=lambda s: None)
    assert xs.shape[0] == 5 + 6
    seed_best = accs[:5].max()
    overall_best = accs.max()
    assert overall_best >= seed_best  # BO never loses the seeds
    assert overall_best > 0.5  # found a decent optimum on this easy bowl


def test_gp_fit_survives_near_duplicate_rows():
    """float32 Cholesky must not silently NaN the fit when BO proposes
    near-duplicate candidates (noise floor + jitter + finite-loss guard)."""
    import numpy as np
    from gen_adversarial_tpu.search.gp import fit_gp, gp_posterior
    rng = np.random.RandomState(0)
    xs = np.vstack([rng.rand(7, 5), rng.rand(1, 5)]).astype(np.float32)
    xs[-1] = xs[-2] + 1e-7
    ys = rng.rand(8).astype(np.float32)
    params = fit_gp(jnp.asarray(xs), jnp.asarray(ys))
    mu, var = gp_posterior(params, jnp.asarray(xs), jnp.asarray(ys),
                           jnp.asarray(xs[:3]))
    assert np.all(np.isfinite(np.asarray(mu)))
    assert np.all(np.isfinite(np.asarray(var)))


def test_gp_fit_survives_near_duplicate_rows():
    """float32 Cholesky must not silently NaN the fit when BO proposes
    near-duplicate candidates (noise floor + jitter + finite-loss guard)."""
    import numpy as np
    from gen_adversarial_tpu.search.gp import fit_gp, gp_posterior
    rng = np.random.RandomState(0)
    xs = np.vstack([rng.rand(7, 5), rng.rand(1, 5)]).astype(np.float32)
    xs[-1] = xs[-2] + 1e-7
    ys = rng.rand(8).astype(np.float32)
    params = fit_gp(jnp.asarray(xs), jnp.asarray(ys))
    mu, var = gp_posterior(params, jnp.asarray(xs), jnp.asarray(ys),
                           jnp.asarray(xs[:3]))
    assert np.all(np.isfinite(np.asarray(mu)))
    assert np.all(np.isfinite(np.asarray(var)))


def test_grid_search_resume_after_crash(tmp_path):
    """Killing a grid search mid-run and re-running continues at the next
    step with an identical RNG stream: the union of results equals an
    uninterrupted run's exactly, and completed steps are not re-evaluated."""
    from gen_adversarial_tpu.search.grid import grid_search

    def objective(a):
        return float(1.0 - np.mean((np.asarray(a) - 0.3) ** 2))

    want_a, want_acc = grid_search(objective, 3, 8, seed=5,
                                   results_folder=str(tmp_path / "full"),
                                   log_fn=lambda s: None)

    calls = {"n": 0}

    def crashing_objective(a):
        calls["n"] += 1
        if calls["n"] == 5:
            raise RuntimeError("boom")
        return objective(a)

    out = tmp_path / "res"
    with pytest.raises(RuntimeError):
        grid_search(crashing_objective, 3, 8, seed=5,
                    results_folder=str(out), log_fn=lambda s: None)
    assert (out / "grid_progress.json").exists()
    # partial results are already in the final format
    assert np.load(out / "alphas.npy").shape == (4, 3)

    logs, evals = [], {"n": 0}

    def counting_objective(a):
        evals["n"] += 1
        return objective(a)

    got_a, got_acc = grid_search(counting_objective, 3, 8, seed=5,
                                 results_folder=str(out), log_fn=logs.append)
    assert any(l.startswith("[resume] continuing at evaluation 4") for l in logs)
    assert evals["n"] == 4  # only the unfinished steps ran
    assert not (out / "grid_progress.json").exists()
    np.testing.assert_array_equal(got_a, want_a)
    np.testing.assert_array_equal(got_acc, want_acc)
    np.testing.assert_array_equal(np.load(out / "alphas.npy"), want_a)


def test_bayesian_optimize_resume_after_crash(tmp_path):
    """BO resume: crash after the seeds + one step, re-run, exact equality
    with the uninterrupted trajectory (GP inputs and key stream replayed)."""
    from gen_adversarial_tpu.search.gp import bayesian_optimize

    rng_target = np.full(4, 0.6)

    def objective(a):
        return float(1.0 - np.mean((np.asarray(a) - rng_target) ** 2))

    want_x, want_acc = bayesian_optimize(
        objective, n_alphas=4, n_steps=3, seed=2,
        results_folder=str(tmp_path / "full"), log_fn=lambda s: None)
    assert not (tmp_path / "full" / "bo_progress.json").exists()

    calls = {"n": 0}

    def crashing_objective(a):
        calls["n"] += 1
        if calls["n"] == 7:  # 5 seeds + 1 BO step done, die inside step 2
            raise RuntimeError("boom")
        return objective(a)

    out = tmp_path / "res"
    with pytest.raises(RuntimeError):
        bayesian_optimize(crashing_objective, n_alphas=4, n_steps=3, seed=2,
                          results_folder=str(out), log_fn=lambda s: None)
    assert (out / "bo_progress.json").exists()

    logs, evals = [], {"n": 0}

    def counting_objective(a):
        evals["n"] += 1
        return objective(a)

    got_x, got_acc = bayesian_optimize(
        counting_objective, n_alphas=4, n_steps=3, seed=2,
        results_folder=str(out), log_fn=logs.append)
    assert any(l.startswith("[resume] continuing at evaluation 6") for l in logs)
    assert evals["n"] == 2  # only the two unfinished BO steps ran
    np.testing.assert_array_equal(got_x, want_x)
    np.testing.assert_array_equal(got_acc, want_acc)
