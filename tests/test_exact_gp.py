"""Exact GP: NLML value/grad vs naive implementations, custom VJP vs autodiff."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gpras_tpu.gp import exact
from gpras_tpu.ops import kernels as K


def make_data(n=30, d=2, p=1, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, d))
    y = np.sin(x[:, 0]) + 0.1 * rng.normal(size=(n,))
    if p > 1:
        y = np.stack([y * (i + 1) for i in range(p)], axis=1)
    return jnp.asarray(x), jnp.asarray(y)


def naive_nlml(kernel, params, x, y):
    """Direct slogdet/solve evaluation in float64 numpy."""
    xn, yn = np.asarray(x), np.asarray(y)
    if yn.ndim == 1:
        yn = yn[:, None]
    kmat = np.asarray(K.gram(kernel, params, x))
    noise = np.exp(float(params["log_noise_variance"]))
    jit = 1e-9 * np.exp(float(params["log_variance"]))
    kmat = kmat + (noise + jit) * np.eye(len(xn))
    _, logdet = np.linalg.slogdet(kmat)
    kinv_y = np.linalg.solve(kmat, yn)
    n, p = yn.shape
    return 0.5 * np.sum(yn * kinv_y) + 0.5 * p * logdet + 0.5 * p * n * np.log(2 * np.pi)


@pytest.mark.parametrize("kernel", ["RBF", "Matern32", "Matern52"])
def test_nlml_matches_naive(kernel):
    x, y = make_data()
    params = exact.init_params(kernel, x, noise_variance=0.05)
    got = float(exact.nlml(kernel, params, x, y))
    want = naive_nlml(kernel, params, x, y)
    np.testing.assert_allclose(got, want, rtol=1e-8)


def test_nlml_multioutput_is_sum_of_single_outputs():
    x, y = make_data(p=3)
    params = exact.init_params("RBF", x, noise_variance=0.1)
    total = float(exact.nlml("RBF", params, x, y))
    parts = sum(float(exact.nlml("RBF", params, x, y[:, i])) for i in range(3))
    np.testing.assert_allclose(total, parts, rtol=1e-10)


def test_custom_vjp_matches_finite_differences():
    # eps must stay well above the ~1e-8 backend-dependent evaluation noise of the
    # nlml value (cholesky-vs-slogdet path differences); 1e-4 keeps FD truncation
    # and evaluation noise both below rtol.
    x, y = make_data(n=25)
    params = exact.init_params("Matern52", x, noise_variance=0.2)
    grads = jax.grad(lambda p: exact.nlml("Matern52", p, x, y))(params)
    eps = 1e-4
    for name in ["log_variance", "log_noise_variance"]:
        p_plus = dict(params)
        p_plus[name] = params[name] + eps
        p_minus = dict(params)
        p_minus[name] = params[name] - eps
        fd = (float(exact.nlml("Matern52", p_plus, x, y))
              - float(exact.nlml("Matern52", p_minus, x, y))) / (2 * eps)
        np.testing.assert_allclose(float(grads[name]), fd, rtol=1e-3, atol=1e-6)
    # ARD lengthscales elementwise
    for i in range(x.shape[1]):
        p_plus = dict(params)
        p_plus["log_lengthscales"] = params["log_lengthscales"].at[i].add(eps)
        p_minus = dict(params)
        p_minus["log_lengthscales"] = params["log_lengthscales"].at[i].add(-eps)
        fd = (float(exact.nlml("Matern52", p_plus, x, y))
              - float(exact.nlml("Matern52", p_minus, x, y))) / (2 * eps)
        np.testing.assert_allclose(float(grads["log_lengthscales"][i]), fd, rtol=1e-3, atol=1e-6)


def test_custom_vjp_matches_plain_autodiff():
    """The Cholesky-reusing backward must agree with autodiff through slogdet/solve."""
    x, y = make_data(n=20)
    params = exact.init_params("RBF", x, noise_variance=0.3)

    def plain(p):
        kmat = exact.build_train_gram("RBF", p, x)
        y2 = y[:, None]
        sign, logdet = jnp.linalg.slogdet(kmat)
        quad = 0.5 * jnp.sum(y2 * jnp.linalg.solve(kmat, y2))
        return quad + 0.5 * logdet + 0.5 * len(x) * jnp.log(2 * jnp.pi)

    g_custom = jax.grad(lambda p: exact.nlml("RBF", p, x, y))(params)
    g_plain = jax.grad(plain)(params)
    for k in g_custom:
        np.testing.assert_allclose(np.asarray(g_custom[k]), np.asarray(g_plain[k]),
                                   rtol=1e-7, atol=1e-9)


def test_predict_interpolates_noiseless_data():
    """With tiny noise, posterior mean at training points ~= y; far away -> prior.

    The target must be noise-free: observation noise projects onto the Gram
    matrix's near-null eigendirections, which no near-noiseless GP can fit.
    """
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(40, 2)))
    y = jnp.sin(x[:, 0])  # smooth, no added noise
    params = exact.init_params("RBF", x, noise_variance=1e-6)
    mean, var = exact.predict("RBF", params, x, y, x, include_noise=False)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(y), atol=1e-3)
    assert np.all(np.asarray(var) >= 0)
    far = jnp.asarray(np.full((3, 2), 100.0))
    mean_far, var_far = exact.predict("RBF", params, x, y, far, include_noise=False)
    np.testing.assert_allclose(np.asarray(mean_far), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(var_far), np.exp(float(params["log_variance"])),
                               rtol=1e-5)


def test_predict_y_adds_noise_variance():
    x, y = make_data(n=15)
    params = exact.init_params("RBF", x, noise_variance=0.25)
    _, var_f = exact.predict("RBF", params, x, y, x, include_noise=False)
    _, var_y = exact.predict("RBF", params, x, y, x, include_noise=True)
    np.testing.assert_allclose(np.asarray(var_y) - np.asarray(var_f), 0.25, rtol=1e-6)


def test_training_loss_includes_normal_log_prior():
    x, y = make_data(n=10)
    params = exact.init_params("RBF", x)
    nlml_val = float(exact.nlml("RBF", params, x, y))
    loss = float(exact.training_loss("RBF", params, x, y))
    from gpras_tpu.gp.priors import log_prior
    np.testing.assert_allclose(loss, nlml_val - float(log_prior(params)), rtol=1e-10)
