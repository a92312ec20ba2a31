"""Hutchinson stochastic backward: unbiasedness and convergence to the exact grad."""

import numpy as np
import jax
import jax.numpy as jnp

from gpras_tpu.gp import exact
from gpras_tpu.gp.exact_stochastic import make_hutchinson_nlml


def make_data(n=48, d=3, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(n, d)))
    y = jnp.asarray(np.sin(np.asarray(x)[:, 0]) + 0.1 * rng.normal(size=n))
    return x, y


def test_value_is_exact():
    x, y = make_data()
    params = exact.init_params("Matern52", x, noise_variance=0.2)
    nlml = make_hutchinson_nlml("Matern52", probes=4, col_panel=16)
    got = float(nlml(params, x, y, jax.random.PRNGKey(0)))
    want = float(exact.nlml("Matern52", params, x, y))
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_value_is_key_invariant():
    """The loss VALUE is probe-key independent (the key only enters the
    stochastic backward). bench.py's certify-first stage B — one forward
    NLML evaluation deciding whether warm-started params are inside the
    reference stopping band — rests on this invariant."""
    x, y = make_data(seed=4)
    params = exact.init_params("Matern52", x, noise_variance=0.2)
    nlml = make_hutchinson_nlml("Matern52", probes=4, col_panel=16)
    v0 = float(nlml(params, x, y, jax.random.PRNGKey(0)))
    v1 = float(nlml(params, x, y, jax.random.PRNGKey(123)))
    assert v0 == v1


def test_gradient_estimator_is_unbiased():
    """Averaging the stochastic gradient over many keys converges to exact."""
    x, y = make_data(seed=1)
    params = exact.init_params("RBF", x, noise_variance=0.3)
    nlml = make_hutchinson_nlml("RBF", probes=8, col_panel=16)
    g_exact = jax.grad(lambda p: exact.nlml("RBF", p, x, y))(params)

    grad_fn = jax.jit(jax.grad(lambda p, k: nlml(p, x, y, k)))
    keys = jax.random.split(jax.random.PRNGKey(42), 64)
    acc = jax.tree.map(jnp.zeros_like, params)
    for k in keys:
        g = grad_fn(params, k)
        acc = jax.tree.map(jnp.add, acc, g)
    mean_g = jax.tree.map(lambda a: a / len(keys), acc)
    for name in g_exact:
        ge = np.asarray(g_exact[name])
        gm = np.asarray(mean_g[name])
        scale = max(np.max(np.abs(ge)), 1.0)
        # Monte-Carlo tolerance: 512 effective probes
        np.testing.assert_allclose(gm, ge, atol=0.15 * scale,
                                   err_msg=name)


def test_quadratic_term_is_exact_regardless_of_key():
    """Only the trace term is stochastic: the y-gradient (alpha) is exact."""
    x, y = make_data(seed=2)
    params = exact.init_params("RBF", x, noise_variance=0.2)
    nlml = make_hutchinson_nlml("RBF", probes=2, col_panel=16)
    gy1 = jax.grad(lambda yy: nlml(params, x, yy, jax.random.PRNGKey(0)))(y)
    gy2 = jax.grad(lambda yy: nlml(params, x, yy, jax.random.PRNGKey(7)))(y)
    np.testing.assert_allclose(np.asarray(gy1), np.asarray(gy2), rtol=1e-12)
    # equals the exact y-gradient
    gy_exact = jax.grad(lambda yy: exact.nlml("RBF", params, x, yy))(y)
    np.testing.assert_allclose(np.asarray(gy1), np.asarray(gy_exact), rtol=1e-8)


def test_adam_converges_with_stochastic_gradients():
    """Fitting with the stochastic backward reaches ~ the same loss as exact."""
    import optax

    x, y = make_data(n=64, seed=3)
    nlml = make_hutchinson_nlml("RBF", probes=8, col_panel=32)
    opt = optax.adam(0.05)

    def run(loss_grad, params, steps=120):
        state = opt.init(params)
        key = jax.random.PRNGKey(0)
        for i in range(steps):
            key, sub = jax.random.split(key)
            g = loss_grad(params, sub)
            updates, state = opt.update(g, state, params)
            params = optax.apply_updates(params, updates)
        return params

    params0 = exact.init_params("RBF", x, noise_variance=1.0)
    stoch_grad = jax.jit(jax.grad(lambda p, k: nlml(p, x, y, k)))
    exact_grad = jax.jit(lambda p, k: jax.grad(
        lambda pp: exact.nlml("RBF", pp, x, y))(p))
    p_stoch = run(stoch_grad, params0)
    p_exact = run(exact_grad, params0)
    f_stoch = float(exact.nlml("RBF", p_stoch, x, y))
    f_exact = float(exact.nlml("RBF", p_exact, x, y))
    assert f_stoch < float(exact.nlml("RBF", params0, x, y))
    assert f_stoch < f_exact + 3.0, (f_stoch, f_exact)


def test_super_chol_engine_matches_xla_engine():
    """chol='super' (in-place super-panel factorization + flat-compile panel
    solves + fused gram) must produce the same loss and gradients as the
    default XLA engine at matching probes/key."""
    x, y = make_data(n=64, d=3, seed=3)
    params = exact.init_params("Matern52", x, noise_variance=0.2)
    key = jax.random.PRNGKey(5)
    ref_nlml = make_hutchinson_nlml("Matern52", probes=4, col_panel=16)
    sup_nlml = make_hutchinson_nlml("Matern52", probes=4, col_panel=16,
                                    chol="super", chol_w=16, chol_strip=24)
    v_ref = float(ref_nlml(params, x, y, key))
    v_sup = float(sup_nlml(params, x, y, key))
    np.testing.assert_allclose(v_sup, v_ref, rtol=1e-8)
    g_ref = jax.grad(lambda p: ref_nlml(p, x, y, key))(params)
    g_sup = jax.grad(lambda p: sup_nlml(p, x, y, key))(params)
    for name in g_ref:
        np.testing.assert_allclose(np.asarray(g_sup[name]),
                                   np.asarray(g_ref[name]), rtol=1e-6,
                                   err_msg=name)
