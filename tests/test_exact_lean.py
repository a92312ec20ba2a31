"""Lean (panel-scan backward) NLML must match the dense custom VJP exactly."""

import numpy as np
import jax
import jax.numpy as jnp

from gpras_tpu.gp import exact
from gpras_tpu.gp.exact_lean import make_lean_nlml, make_lean_training_loss


def make_data(n=48, d=3, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(n, d)))
    y = jnp.asarray(np.sin(np.asarray(x)[:, 0]) + 0.1 * rng.normal(size=n))
    return x, y


def test_lean_nlml_value_matches_dense():
    x, y = make_data()
    params = exact.init_params("Matern52", x, noise_variance=0.2)
    lean = make_lean_nlml("Matern52", col_panel=16)
    np.testing.assert_allclose(float(lean(params, x, y)),
                               float(exact.nlml("Matern52", params, x, y)),
                               rtol=1e-10)


def test_lean_gradient_matches_dense():
    x, y = make_data(seed=1)
    params = exact.init_params("RBF", x, noise_variance=0.3)
    lean = make_lean_nlml("RBF", col_panel=16)
    g_lean = jax.grad(lean)(params, x, y)
    g_dense = jax.grad(lambda p: exact.nlml("RBF", p, x, y))(params)
    for k in g_dense:
        np.testing.assert_allclose(np.asarray(g_lean[k]), np.asarray(g_dense[k]),
                                   rtol=1e-8, atol=1e-10)


def test_lean_gradient_uneven_panel_fallback():
    """n not divisible by requested panel -> silently shrinks the panel."""
    x, y = make_data(n=42, seed=2)
    params = exact.init_params("Matern32", x, noise_variance=0.1)
    lean = make_lean_nlml("Matern32", col_panel=16)  # 42 % 16 != 0 -> r=14
    g_lean = jax.grad(lean)(params, x, y)
    g_dense = jax.grad(lambda p: exact.nlml("Matern32", p, x, y))(params)
    for k in g_dense:
        np.testing.assert_allclose(np.asarray(g_lean[k]), np.asarray(g_dense[k]),
                                   rtol=1e-8, atol=1e-10)


def test_lean_training_loss_includes_prior():
    x, y = make_data(seed=3)
    params = exact.init_params("RBF", x)
    loss = make_lean_training_loss("RBF", col_panel=16)
    want = float(exact.training_loss("RBF", params, x, y))
    np.testing.assert_allclose(float(loss(params, x, y)), want, rtol=1e-10)


def test_lean_blocked_matches_dense():
    """blocked=b (fori_loop cholesky/solves) gives identical values and grads."""
    x, y = make_data(n=48, seed=5)
    params = exact.init_params("Matern52", x, noise_variance=0.2)
    lean_b = make_lean_nlml("Matern52", col_panel=16, blocked=16)
    np.testing.assert_allclose(float(lean_b(params, x, y)),
                               float(exact.nlml("Matern52", params, x, y)),
                               rtol=1e-9)
    g_b = jax.grad(lean_b)(params, x, y)
    g_dense = jax.grad(lambda p: exact.nlml("Matern52", p, x, y))(params)
    for k in g_dense:
        np.testing.assert_allclose(np.asarray(g_b[k]), np.asarray(g_dense[k]),
                                   rtol=1e-7, atol=1e-9)


def test_lean_super_engine_matches_xla():
    """engine='super' (in-place super-panel chol + flat-compile solves) gives
    the same NLML and gradients as the XLA engine."""
    from gpras_tpu.gp.exact_lean import make_lean_nlml

    x, y = make_data(n=64, d=3, seed=9)
    params = exact.init_params("RBF", x, noise_variance=0.2)
    ref = make_lean_nlml("RBF", col_panel=16)
    sup = make_lean_nlml("RBF", col_panel=16, engine="super",
                         chol_w=16, chol_strip=24)
    np.testing.assert_allclose(float(sup(params, x, y)),
                               float(ref(params, x, y)), rtol=1e-9)
    g_ref = jax.grad(lambda p: ref(p, x, y))(params)
    g_sup = jax.grad(lambda p: sup(p, x, y))(params)
    for name in g_ref:
        np.testing.assert_allclose(np.asarray(g_sup[name]),
                                   np.asarray(g_ref[name]), rtol=1e-7,
                                   err_msg=name)
