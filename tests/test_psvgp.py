"""Data-parallel SVGP: the sharded step must match the single-device math."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from gpras_tpu.gp import svgp
from gpras_tpu.parallel import make_mesh
from gpras_tpu.parallel.psvgp import (dp_minibatch_fit, make_dp_minibatch_step,
                                      shard_batch)


def make_data(n=128, m=8, d=3, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    y = jnp.asarray(np.sin(np.asarray(x)[:, 0]).astype(np.float32))
    z = x[:: n // m][:m]
    return x, y, z


def test_dp_step_matches_single_device():
    mesh = make_mesh((8,), ("dp",))
    x, y, z = make_data()
    params = svgp.init_params("RBF", x, z, noise_variance=0.3)

    init, step = make_dp_minibatch_step(mesh, "RBF", n_total=x.shape[0],
                                        learning_rate=0.01)
    xb, yb = shard_batch(mesh, x, y)
    p_dp, _, loss_dp = step(params, init(params), xb, yb)

    # single-device reference: same step, no mesh
    opt = optax.adam(0.01)
    loss_ref, g = jax.value_and_grad(
        lambda p: svgp.training_loss("RBF", p, x, y, x.shape[0]))(params)
    updates, _ = opt.update(g, opt.init(params), params)
    p_ref = optax.apply_updates(params, updates)

    np.testing.assert_allclose(float(loss_dp), float(loss_ref), rtol=1e-5)
    for name in p_ref:
        np.testing.assert_allclose(np.asarray(p_dp[name]),
                                   np.asarray(p_ref[name]),
                                   rtol=2e-4, atol=2e-6, err_msg=name)


def test_dp_fit_improves_bound():
    mesh = make_mesh((8,), ("dp",))
    x, y, z = make_data(n=256, m=8, seed=1)
    params = svgp.init_params("RBF", x, z, noise_variance=0.5)
    p_fit, hist = dp_minibatch_fit(mesh, "RBF", params, np.asarray(x),
                                   np.asarray(y), batch_size=64, epochs=20,
                                   learning_rate=0.02)
    assert hist.shape == (20,)
    assert hist[-1] < hist[0]
    lo0 = float(svgp.elbo("RBF", params, x, y, x.shape[0]))
    lo1 = float(svgp.elbo("RBF", p_fit, x, y, x.shape[0]))
    assert lo1 > lo0
