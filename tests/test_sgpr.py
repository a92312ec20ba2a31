"""SGPR collapsed ELBO: bound properties and agreement with the exact GP at Z=X."""

import numpy as np
import jax
import jax.numpy as jnp

from gpras_tpu.gp import exact, sgpr


def make_data(n=40, d=2, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, d))
    y = np.sin(x[:, 0]) + 0.3 * x[:, 1] + 0.05 * rng.normal(size=(n,))
    return jnp.asarray(x), jnp.asarray(y)


def _params(kernel, x, z, noise=0.1):
    return sgpr.init_params(kernel, x, z, noise_variance=noise)


def test_elbo_equals_exact_lml_when_z_is_x():
    """Titsias bound is tight when the inducing set is the full training set."""
    x, y = make_data()
    params = _params("RBF", x, x)
    elbo_val = float(sgpr.elbo("RBF", params, x, y))
    exact_params = {k: v for k, v in params.items() if k != "z"}
    lml = -float(exact.nlml("RBF", exact_params, x, y))
    np.testing.assert_allclose(elbo_val, lml, rtol=1e-6, atol=1e-6)


def test_elbo_lower_bounds_exact_lml():
    x, y = make_data(n=60)
    rng = np.random.default_rng(1)
    z = jnp.asarray(rng.normal(size=(10, 2)))
    params = _params("Matern52", x, z)
    elbo_val = float(sgpr.elbo("Matern52", params, x, y))
    exact_params = {k: v for k, v in params.items() if k != "z"}
    lml = -float(exact.nlml("Matern52", exact_params, x, y))
    assert elbo_val <= lml + 1e-8


def test_elbo_improves_with_more_inducing_points():
    x, y = make_data(n=80, seed=2)
    vals = []
    for m in (3, 10, 40, 80):
        z = x[:m]
        params = _params("RBF", x, z)
        vals.append(float(sgpr.elbo("RBF", params, x, y)))
    assert vals == sorted(vals), vals


def test_predict_matches_exact_gp_when_z_is_x():
    x, y = make_data(n=30, seed=3)
    s = jnp.asarray(np.random.default_rng(4).normal(size=(12, 2)))
    params = _params("RBF", x, x, noise=0.05)
    mean_s, var_s = sgpr.predict("RBF", params, x, y, s)
    exact_params = {k: v for k, v in params.items() if k != "z"}
    mean_e, var_e = exact.predict("RBF", exact_params, x, y, s)
    np.testing.assert_allclose(np.asarray(mean_s), np.asarray(mean_e), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(var_s), np.asarray(var_e), rtol=1e-4, atol=1e-6)


def test_elbo_multioutput_is_sum_of_single_outputs():
    x, y = make_data(n=25, seed=5)
    y2 = jnp.stack([y, 2.0 * y], axis=1)
    z = x[:8]
    params = _params("RBF", x, z)
    total = float(sgpr.elbo("RBF", params, x, y2))
    parts = sum(float(sgpr.elbo("RBF", params, x, y2[:, i])) for i in range(2))
    np.testing.assert_allclose(total, parts, rtol=1e-9)


def test_elbo_gradients_are_finite_including_z():
    x, y = make_data(n=30, seed=6)
    z = x[:7]
    params = _params("Matern32", x, z)
    grads = jax.grad(lambda p: sgpr.training_loss("Matern32", p, x, y))(params)
    for leaf in jax.tree.leaves(grads):
        assert np.all(np.isfinite(np.asarray(leaf)))
    assert grads["z"].shape == (7, 2)
