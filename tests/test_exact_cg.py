"""Matrix-free BBMM engine: CG solves, SLQ logdet, and gradient consistency."""

import numpy as np
import jax
import jax.numpy as jnp

from gpras_tpu.gp import exact
from gpras_tpu.gp.exact_cg import kmv, make_cg_nlml, mbcg
from gpras_tpu.ops import kernels as K
from gpras_tpu.ops import linalg


def make_data(n=96, d=3, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(n, d)))
    y = jnp.asarray(np.sin(np.asarray(x)[:, 0]) + 0.1 * rng.normal(size=n))
    return x, y


def test_kmv_matches_dense():
    x, _ = make_data()
    params = exact.init_params("Matern52", x, noise_variance=0.3)
    v = jnp.asarray(np.random.default_rng(1).normal(size=(96, 5)))
    noise = jnp.exp(params["log_noise_variance"])
    got = np.asarray(kmv("Matern52", params, x, v, noise, row_panel=32))
    kd = np.asarray(K.gram("Matern52", params, x)) + float(noise) * np.eye(96)
    np.testing.assert_allclose(got, kd @ np.asarray(v), rtol=1e-10)


def test_mbcg_solves():
    x, y = make_data(seed=2)
    params = exact.init_params("RBF", x, noise_variance=0.5)
    noise = jnp.exp(params["log_noise_variance"])
    kd = np.asarray(K.gram("RBF", params, x)) + float(noise) * np.eye(96)
    b = jnp.asarray(np.random.default_rng(3).normal(size=(96, 4)))
    mv = lambda v: kmv("RBF", params, x, v, noise, row_panel=32)
    sol, alphas, betas = mbcg(mv, b, max_iters=96)
    # CG stops at relative residual 1e-6 -> ~1e-5..1e-4 solution error
    np.testing.assert_allclose(np.asarray(sol), np.linalg.solve(kd, np.asarray(b)),
                               rtol=2e-4, atol=1e-6)


def test_cg_nlml_value_close_to_exact():
    """quad is CG-exact; logdet is SLQ — with generous probes/iters the value
    should match the Cholesky NLML to ~1%."""
    x, y = make_data(seed=4)
    params = exact.init_params("Matern52", x, noise_variance=0.3)
    nlml = make_cg_nlml("Matern52", probes=64, max_iters=96,
                        row_panel=32, col_panel=32)
    got = float(nlml(params, x, y, jax.random.PRNGKey(0)))
    want = float(exact.nlml("Matern52", params, x, y))
    assert abs(got - want) / abs(want) < 0.02, (got, want)


def test_cg_gradient_matches_exact_on_average():
    x, y = make_data(n=64, seed=5)
    params = exact.init_params("RBF", x, noise_variance=0.4)
    nlml = make_cg_nlml("RBF", probes=16, max_iters=64,
                        row_panel=32, col_panel=32)
    g_exact = jax.grad(lambda p: exact.nlml("RBF", p, x, y))(params)
    grad_fn = jax.jit(jax.grad(lambda p, k: nlml(p, x, y, k)))
    keys = jax.random.split(jax.random.PRNGKey(9), 32)
    acc = jax.tree.map(jnp.zeros_like, params)
    for k in keys:
        acc = jax.tree.map(jnp.add, acc, grad_fn(params, k))
    mean_g = jax.tree.map(lambda a: a / len(keys), acc)
    for name in g_exact:
        ge, gm = np.asarray(g_exact[name]), np.asarray(mean_g[name])
        scale = max(np.max(np.abs(ge)), 1.0)
        np.testing.assert_allclose(gm, ge, atol=0.1 * scale, err_msg=name)


def test_cg_y_gradient_is_exact():
    x, y = make_data(n=64, seed=6)
    params = exact.init_params("RBF", x, noise_variance=0.4)
    nlml = make_cg_nlml("RBF", probes=4, max_iters=64,
                        row_panel=32, col_panel=32)
    gy = jax.grad(lambda yy: nlml(params, x, yy, jax.random.PRNGKey(0)))(y)
    gy_exact = jax.grad(lambda yy: exact.nlml("RBF", params, x, yy))(y)
    np.testing.assert_allclose(np.asarray(gy), np.asarray(gy_exact),
                               rtol=1e-4, atol=1e-7)
