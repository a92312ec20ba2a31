"""safe_cholesky: adaptive-jitter escalation wired into the GP hot paths."""

import jax
import jax.numpy as jnp
import numpy as np

from gpras_tpu.gp import sgpr
from gpras_tpu.ops import linalg


def _indefinite(n=8, deficit=1e-4, dtype=jnp.float32):
    # ones(n) is PSD rank-1; subtracting deficit*I makes it indefinite, so the
    # raw factorization NaNs and escalation must kick in.
    return jnp.ones((n, n), dtype=dtype) - deficit * jnp.eye(n, dtype=dtype)


def test_safe_cholesky_happy_path_matches_plain():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((16, 6))
    k = jnp.asarray(a @ a.T + 0.5 * np.eye(16), dtype=jnp.float64)
    got = linalg.safe_cholesky(k, jitter=0.0)
    want = jnp.linalg.cholesky(k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-12)


def test_safe_cholesky_recovers_indefinite():
    k = _indefinite()
    raw = jnp.linalg.cholesky(k)
    assert bool(jnp.any(jnp.isnan(raw)))
    l = linalg.safe_cholesky(k, jitter=0.0)
    assert bool(jnp.all(jnp.isfinite(l)))
    # the factor reproduces K up to the escalated jitter (small vs diag scale)
    np.testing.assert_allclose(np.asarray(l @ l.T), np.asarray(k), atol=0.02)


def test_safe_cholesky_recovers_under_jit_and_stale_upper():
    k = _indefinite(dtype=jnp.float32)
    # poison the strict upper triangle: symmetrize=False must ignore it
    poison = jnp.triu(jnp.full_like(k, jnp.nan), k=1)
    k_stale = jnp.tril(k) + jnp.where(jnp.isnan(poison), 0.0, 0.0) + poison

    f = jax.jit(lambda m: linalg.safe_cholesky(m, jitter=0.0, symmetrize=False))
    l = f(k_stale)
    assert bool(jnp.all(jnp.isfinite(l)))


def test_safe_cholesky_gradient_matches_plain_on_spd():
    rng = np.random.default_rng(1)
    a = rng.standard_normal((10, 10))
    k = jnp.asarray(a @ a.T + 10.0 * np.eye(10), dtype=jnp.float64)

    def f_safe(m):
        return jnp.sum(jnp.log(jnp.diagonal(linalg.safe_cholesky(m, jitter=0.0))))

    def f_plain(m):
        return jnp.sum(jnp.log(jnp.diagonal(jnp.linalg.cholesky(m))))

    g_safe = jax.grad(f_safe)(k)
    g_plain = jax.grad(f_plain)(k)
    np.testing.assert_allclose(np.asarray(g_safe), np.asarray(g_plain),
                               rtol=1e-10, atol=1e-12)


def test_sgpr_f32_near_duplicate_inducing_points_recovers():
    """M near-duplicate inducing points make Kuu numerically singular in f32.

    GPflow raises from tf.linalg.cholesky here (reference workflow dies,
    gpras/gpr.py:299); our safe_cholesky escalation must return a finite loss
    AND finite gradients so the fit continues."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((64, 2)), dtype=jnp.float32)
    y = jnp.asarray(rng.standard_normal((64,)), dtype=jnp.float32)
    # 32 inducing points: one location repeated (rank ~1 Kuu)
    z = jnp.tile(x[:1], (32, 1)) + 1e-7 * jnp.asarray(
        rng.standard_normal((32, 2)), dtype=jnp.float32)
    params = sgpr.init_params("RBF", x, z)
    assert params["z"].dtype == jnp.float32

    loss, grads = jax.value_and_grad(
        lambda p: sgpr.training_loss("RBF", p, x, y))(params)
    assert bool(jnp.isfinite(loss))
    for leaf in jax.tree_util.tree_leaves(grads):
        assert bool(jnp.all(jnp.isfinite(leaf)))
