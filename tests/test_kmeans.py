"""k-means and grid inducing initializers."""

import numpy as np
import jax.numpy as jnp

from gpras_tpu.ops import kmeans as km


def test_kmeans_recovers_separated_clusters():
    rng = np.random.default_rng(0)
    centers_true = np.array([[0.0, 0.0], [10.0, 10.0], [-10.0, 5.0]])
    pts = np.concatenate([c + 0.1 * rng.normal(size=(30, 2)) for c in centers_true])
    centers, labels = km.kmeans(jnp.asarray(pts), 3)
    centers = np.asarray(centers)
    # each true center matched by one estimate within noise
    for c in centers_true:
        d = np.min(np.linalg.norm(centers - c, axis=1))
        assert d < 0.2, (c, centers)
    assert np.asarray(labels).shape == (90,)


def test_kmeans_deterministic_for_seed():
    rng = np.random.default_rng(1)
    pts = jnp.asarray(rng.normal(size=(50, 3)))
    c1, _ = km.kmeans(pts, 5, seed=0)
    c2, _ = km.kmeans(pts, 5, seed=0)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))


def test_grid_inducing_matches_reference_construction():
    """Per-feature linspace min->max stacked as columns (gpras/gpr.py:316-320)."""
    rng = np.random.default_rng(2)
    x = rng.normal(size=(40, 3))
    got = np.asarray(km.grid_inducing(jnp.asarray(x), 7))
    want = np.c_[tuple(np.linspace(x[:, j].min(), x[:, j].max(), 7) for j in range(3))]
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_kmeans_inducing_shape():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(60, 4)))
    z = km.kmeans_inducing(x, 8)
    assert z.shape == (8, 4)
