"""2-D-tiled distributed Cholesky/solves/logdet (parallel/pcholesky2d) vs the
dense single-device reference, on 4x2 / 2x4 / 8x1 / 1x8 virtual meshes."""

import numpy as np
import jax.numpy as jnp
import pytest

from gpras_tpu.parallel import make_mesh
from gpras_tpu.parallel.pcholesky2d import (
    dist_cho_solve_2d,
    dist_cholesky_2d,
    dist_logdet_from_chol_2d,
)

N = 64


def make_spd(n=N, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(n, n))
    return jnp.asarray(a @ a.T + n * np.eye(n))


@pytest.mark.parametrize("shape", [(4, 2), (2, 4), (8, 1), (1, 8)])
def test_cholesky_2d_matches_dense(shape):
    mesh = make_mesh(shape, ("i", "j"))
    k = make_spd()
    got = np.asarray(dist_cholesky_2d(mesh, k, b=8))
    want = np.linalg.cholesky(np.asarray(k))
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)


def test_cholesky_2d_block_equals_local_extent():
    """b equal to the smaller local extent (nc = 64/4 = 16) still works."""
    mesh = make_mesh((2, 4), ("i", "j"))
    k = make_spd(seed=5)
    got = np.asarray(dist_cholesky_2d(mesh, k, b=16))
    want = np.linalg.cholesky(np.asarray(k))
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)


def test_cholesky_2d_rejects_straddling_blocks():
    mesh = make_mesh((4, 2), ("i", "j"))
    k = make_spd()
    with pytest.raises(ValueError, match="block size"):
        dist_cholesky_2d(mesh, k, b=24)
    with pytest.raises(ValueError, match="divide"):
        dist_cholesky_2d(mesh, make_spd(n=60), b=4)


@pytest.mark.parametrize("shape", [(4, 2), (2, 4)])
def test_solve_2d_matches_dense(shape):
    mesh = make_mesh(shape, ("i", "j"))
    k = make_spd(seed=2)
    rng = np.random.default_rng(3)
    rhs = jnp.asarray(rng.normal(size=(N, 4)))
    l = dist_cholesky_2d(mesh, k, b=8)
    got = np.asarray(dist_cho_solve_2d(mesh, l, rhs, b=8))
    want = np.linalg.solve(np.asarray(k), np.asarray(rhs))
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-8)
    got1 = np.asarray(dist_cho_solve_2d(mesh, l, rhs[:, 0], b=8))
    np.testing.assert_allclose(got1, want[:, 0], rtol=1e-8, atol=1e-8)


def test_logdet_2d_matches_dense():
    mesh = make_mesh((4, 2), ("i", "j"))
    k = make_spd(seed=4)
    l = dist_cholesky_2d(mesh, k, b=8)
    got = float(dist_logdet_from_chol_2d(mesh, l))
    want = float(np.linalg.slogdet(np.asarray(k))[1])
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_2d_composes_with_pgram_2d():
    """End-to-end: 2-D sharded Gram -> 2-D Cholesky -> solve == dense GP
    linear algebra (the BASELINE configs[4] layout)."""
    from gpras_tpu.ops import kernels as K
    from gpras_tpu.parallel.pgram import pgram_2d

    mesh = make_mesh((4, 2), ("i", "j"))
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(N, 3)))
    y = np.sin(np.asarray(x)[:, 0])
    params = K.init_params("Matern52", 3, dtype=jnp.float64)
    kmat = pgram_2d(mesh, "Matern52", params, x)
    kmat = kmat + 0.1 * jnp.eye(N, dtype=kmat.dtype)
    l = dist_cholesky_2d(mesh, kmat, b=8)
    alpha = dist_cho_solve_2d(mesh, l, jnp.asarray(y), b=8)
    kd = np.asarray(K.gram("Matern52", params, x)) + 0.1 * np.eye(N)
    np.testing.assert_allclose(np.asarray(alpha), np.linalg.solve(kd, y),
                               rtol=1e-8, atol=1e-8)


def test_dist_nlml_2d_matches_1d_and_grads():
    """The 2-D-layout distributed NLML (pexact layout='2d') matches the 1-D
    value and gradients on a (4, 2) mesh."""
    import jax
    from gpras_tpu.gp import exact
    from gpras_tpu.parallel.pexact import make_dist_nlml

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(N, 3)))
    y = jnp.asarray(np.sin(np.asarray(x)[:, 0]) + 0.1 * rng.normal(size=N))
    params = exact.init_params("Matern52", x, noise_variance=0.1)

    mesh2 = make_mesh((4, 2), ("i", "j"))
    nlml_2d = make_dist_nlml(mesh2, "Matern52", b=8, col_batch=16,
                             layout="2d")
    v2, g2 = jax.value_and_grad(nlml_2d)(params, x, y)

    mesh1 = make_mesh((8,), ("i",))
    nlml_1d = make_dist_nlml(mesh1, "Matern52", b=8, col_batch=16)
    v1, g1 = jax.value_and_grad(nlml_1d)(params, x, y)

    np.testing.assert_allclose(float(v2), float(v1), rtol=1e-10)
    for k in g1:
        np.testing.assert_allclose(np.asarray(g2[k]), np.asarray(g1[k]),
                                   rtol=1e-8, atol=1e-10)


def test_dist_nlml_2d_rejects_incompatible_col_batch():
    """col_batch smaller than the mesh 'j' axis cannot tile the backward —
    must raise a clear error, not ZeroDivisionError."""
    import jax
    from gpras_tpu.gp import exact
    from gpras_tpu.parallel.pexact import make_dist_nlml

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(N, 3)))
    y = jnp.asarray(np.sin(np.asarray(x)[:, 0]))
    params = exact.init_params("RBF", x, noise_variance=0.2)
    mesh = make_mesh((1, 8), ("i", "j"))
    nlml = make_dist_nlml(mesh, "RBF", b=8, col_batch=3, layout="2d")
    with pytest.raises(ValueError, match="column batch"):
        jax.grad(nlml)(params, x, y)
