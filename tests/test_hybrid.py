"""Hybrid data x model parallel step over a ("dp", "i", "j") mesh.

Validates the multi-slice layout (parallel/hybrid.py) on a virtual
(2, 2, 2) CPU mesh: per-mode NLML values and Hutchinson gradients must
match a dense single-device replication of the same math (same probe
draws), and the jitted Adam step must make fitting progress.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from gpras_tpu.gp import exact
from gpras_tpu.ops import kernels as K
from gpras_tpu.ops import linalg
from gpras_tpu.parallel import make_mesh
from gpras_tpu.parallel.hybrid import (
    make_hybrid_fit_step,
    make_hybrid_nlml_and_grads,
)

KERNEL = "Matern52"
N, D, P_MODES, B, PROBES = 32, 3, 4, 8, 8


def _mesh():
    return make_mesh((2, 2, 2), ("dp", "i", "j"))


def _data(seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(N, D)))
    y = jnp.asarray(
        np.stack([np.sin(np.asarray(rng.normal(size=N)) + i) for i in
                  range(P_MODES)], axis=1))
    return x, y


def _params_batched(x):
    ps = [exact.init_params(KERNEL, x, noise_variance=0.1,
                            lengthscales=0.5 + 0.3 * i)
          for i in range(P_MODES)]
    return jax.tree.map(lambda *ls: jnp.stack(ls), *ps)


def _ref_loss_grads(p, x, y_col, z):
    """Dense single-device replication of the hybrid body's math: NLML value
    and the rank-(m+1) Hutchinson cotangent contracted against the FULL
    Gram jacobian (noise diagonal included, so the explicit diag terms in
    the hybrid body are covered by the same pullback)."""
    n = x.shape[0]
    m = z.shape[1]
    jit = linalg.default_jitter(x.dtype)

    def build(pp):
        noise = jnp.exp(pp["log_noise_variance"]) + \
            jit * jnp.exp(pp["log_variance"])
        return K.gram(KERNEL, pp, x, x) + noise * jnp.eye(n, dtype=x.dtype)

    k = build(p)
    l = jnp.linalg.cholesky(k)
    alpha = jax.scipy.linalg.cho_solve((l, True), y_col)
    w = jax.scipy.linalg.cho_solve((l, True), z)
    loss = 0.5 * jnp.vdot(y_col, alpha) + jnp.sum(jnp.log(jnp.diag(l))) + \
        0.5 * n * math.log(2.0 * math.pi)
    kbar = 0.5 * (jnp.matmul(w, z.T) / m - jnp.outer(alpha, alpha))
    _, pullback = jax.vjp(build, p)
    (gr,) = pullback(kbar)
    return loss, gr


def test_hybrid_nlml_and_grads_match_dense():
    mesh = _mesh()
    x, y = _data()
    params_b = _params_batched(x)
    key = jax.random.PRNGKey(7)

    fn = make_hybrid_nlml_and_grads(mesh, KERNEL, b=B, probes=PROBES)
    losses, grads = jax.jit(fn)(params_b, x, y, key)
    assert losses.shape == (P_MODES,)

    for mode in range(P_MODES):
        p = jax.tree.map(lambda leaf: leaf[mode], params_b)
        z = jax.random.rademacher(jax.random.fold_in(key, mode),
                                  (N, PROBES), dtype=x.dtype)
        ref_loss, ref_gr = _ref_loss_grads(p, x, y[:, mode], z)
        np.testing.assert_allclose(np.asarray(losses[mode]),
                                   np.asarray(ref_loss), rtol=1e-8)
        for name in ref_gr:
            np.testing.assert_allclose(
                np.asarray(jax.tree.map(lambda leaf: leaf[mode], grads)[name]),
                np.asarray(ref_gr[name]), rtol=1e-6, atol=1e-9,
                err_msg=f"mode {mode} grad {name}")


def test_hybrid_fit_step_makes_progress():
    mesh = _mesh()
    x, y = _data(seed=1)
    params_b = _params_batched(x)

    init, step = make_hybrid_fit_step(mesh, KERNEL, b=B, probes=PROBES,
                                      learning_rate=0.05)
    opt_state = init(params_b)
    key = jax.random.PRNGKey(0)
    first = None
    for _ in range(10):
        params_b, opt_state, losses, key = step(params_b, opt_state, x, y,
                                                key)
        if first is None:
            first = jnp.sum(losses)
    last = jnp.sum(losses)
    assert bool(np.isfinite(float(last)))
    assert float(last) < float(first), (float(first), float(last))


def test_hybrid_shape_validation():
    import pytest

    mesh = _mesh()
    fn = make_hybrid_nlml_and_grads(mesh, KERNEL, b=B, probes=4)
    x, y = _data()
    params_b = _params_batched(x)
    with pytest.raises(ValueError, match="modes must divide"):
        fn(params_b, x, y[:, :3], jax.random.PRNGKey(0))
    mesh_bad = make_mesh((8,), ("i",))
    with pytest.raises(ValueError, match="needs mesh axis"):
        make_hybrid_nlml_and_grads(mesh_bad, KERNEL, b=B)(
            params_b, x, y, jax.random.PRNGKey(0))
