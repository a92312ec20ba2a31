"""Kernel Gram builders vs closed-form values and naive O(N^2 D) references."""

import numpy as np
import jax.numpy as jnp
import pytest

from gpras_tpu.ops import kernels as K


def naive_gram(kernel, params, x1, x2):
    """Straightforward per-pair evaluation (float64 numpy) as ground truth."""
    p = {k: np.asarray(v, dtype=np.float64) for k, v in params.items()}
    s2 = np.exp(p["log_variance"])
    out = np.zeros((x1.shape[0], x2.shape[0]))
    for i in range(x1.shape[0]):
        for j in range(x2.shape[0]):
            a, b = x1[i], x2[j]
            if kernel in K.STATIONARY_KERNELS:
                ls = np.exp(p["log_lengthscales"])
                r2 = np.sum(((a - b) / ls) ** 2)
                r = np.sqrt(r2)
                if kernel == "RBF":
                    out[i, j] = s2 * np.exp(-0.5 * r2)
                elif kernel == "Matern12":
                    out[i, j] = s2 * np.exp(-r)
                elif kernel == "Matern32":
                    out[i, j] = s2 * (1 + np.sqrt(3) * r) * np.exp(-np.sqrt(3) * r)
                elif kernel == "Matern52":
                    out[i, j] = s2 * (1 + np.sqrt(5) * r + 5 / 3 * r2) * np.exp(-np.sqrt(5) * r)
                elif kernel == "Exponential":
                    out[i, j] = s2 * np.exp(-0.5 * r)
            elif kernel == "Linear":
                out[i, j] = s2 * a @ b
            elif kernel == "Polynomial":
                out[i, j] = (s2 * a @ b + np.exp(p["log_offset"])) ** p["degree"]
            elif kernel == "Periodic":
                ls = np.exp(p["log_lengthscales"])
                period = np.exp(p["log_period"])
                r2 = np.sum((2 * np.sin(np.pi * (a - b) / period) / ls) ** 2)
                out[i, j] = s2 * np.exp(-0.5 * r2)
    return out


@pytest.mark.parametrize("kernel", K.KERNEL_NAMES)
def test_gram_matches_naive(kernel):
    rng = np.random.default_rng(0)
    x1 = rng.normal(size=(7, 3))
    x2 = rng.normal(size=(5, 3))
    params = K.init_params(kernel, 3, variance=1.7, lengthscales=np.array([0.5, 1.0, 2.0]),
                           period=1.3, offset=0.7, degree=3.0, dtype=jnp.float64)
    got = np.asarray(K.gram(kernel, params, jnp.asarray(x1), jnp.asarray(x2)))
    want = naive_gram(kernel, params, x1, x2)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)


@pytest.mark.parametrize("kernel", K.KERNEL_NAMES)
def test_kdiag_matches_gram_diagonal(kernel):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(6, 2)))
    params = K.init_params(kernel, 2, variance=0.9, lengthscales=1.4, dtype=jnp.float64)
    full = np.diag(np.asarray(K.gram(kernel, params, x)))
    diag = np.asarray(K.kdiag(kernel, params, x))
    np.testing.assert_allclose(diag, full, rtol=1e-8, atol=1e-10)


def test_gram_symmetry_and_psd():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(20, 4)))
    for kernel in K.STATIONARY_KERNELS:
        params = K.init_params(kernel, 4, dtype=jnp.float64)
        g = np.asarray(K.gram(kernel, params, x))
        np.testing.assert_allclose(g, g.T, atol=1e-12)
        evals = np.linalg.eigvalsh(g)
        assert evals.min() > -1e-8


def test_constrain_roundtrip():
    params = K.init_params("Periodic", 3, variance=2.0, lengthscales=0.3, period=1.1,
                           dtype=jnp.float64)
    back = K.unconstrain(K.constrain(params))
    for k in params:
        np.testing.assert_allclose(np.asarray(back[k]), np.asarray(params[k]), rtol=1e-12)


def test_gram_gradients_finite_at_coincident_points():
    """Matern gradients must not NaN when x1 == x2 rows coincide (r=0)."""
    import jax

    x = jnp.asarray(np.ones((4, 2)))  # all points identical: worst case
    for kernel in K.KERNEL_NAMES:
        params = K.init_params(kernel, 2, dtype=jnp.float64)

        def f(p):
            return jnp.sum(K.gram(kernel, p, x))

        grads = jax.grad(f)(params)
        for leaf in jax.tree.leaves(grads):
            assert np.all(np.isfinite(np.asarray(leaf))), kernel


def test_pallas_kmv_interpret_matches_dense():
    """Fused Gram@V pallas kernel (interpret mode on CPU): square with fused
    noise diagonal, rectangular cross, and ragged shapes incl. R padding."""
    import numpy as np
    import jax.numpy as jnp

    from gpras_tpu.ops import kernels as K
    from gpras_tpu.ops.pallas_gram import pallas_kmv

    rng = np.random.default_rng(7)
    params = {"log_variance": jnp.asarray(0.3, jnp.float32),
              "log_lengthscales": jnp.asarray(np.log(rng.uniform(0.5, 2.0, 3)),
                                              jnp.float32)}
    x1 = jnp.asarray(rng.normal(size=(300, 3)), jnp.float32)
    v1 = jnp.asarray(rng.normal(size=(300, 5)), jnp.float32)
    kd = np.asarray(K.gram("Matern52", params, x1)) + 0.25 * np.eye(300)
    got = np.asarray(pallas_kmv("Matern52", params, x1, v1,
                                noise=jnp.float32(0.25), interpret=True))
    np.testing.assert_allclose(got, kd @ np.asarray(v1), rtol=2e-4, atol=2e-4)

    x2 = jnp.asarray(rng.normal(size=(140, 3)), jnp.float32)
    v2 = jnp.asarray(rng.normal(size=(140, 2)), jnp.float32)
    kx = np.asarray(K.gram("RBF", params, x1, x2))
    got2 = np.asarray(pallas_kmv("RBF", params, x1, v2, x2=x2, interpret=True))
    np.testing.assert_allclose(got2, kx @ np.asarray(v2), rtol=2e-4, atol=2e-4)


def test_pallas_kgrad_matches_f64_autodiff_contraction():
    """Fused gradient contraction (pallas_kgrad, interpret mode) == FLOAT64
    autodiff vjp of the dense Gram contracted with the same rank-(m+1)
    cotangent, for every stationary kernel, including grid accumulation and
    row padding.

    The reference is f64 deliberately: for the r-singular kernels
    (Matern12/Exponential) the F32 autodiff path itself is ~5% off the f64
    truth (its matmul-based r2 has absolute error ~1e-6, which corrupts
    exp(-r) near r=0), while the fused kernel tracks f64 to ~0.3%
    (HIGHEST-precision distance matmul; measured in round 3)."""
    import jax

    from gpras_tpu.ops.pallas_gram import pallas_kgrad

    rng = np.random.default_rng(5)
    for kernel in ("RBF", "Matern12", "Matern32", "Matern52", "Exponential"):
        for n in (512, 640):  # one tile; padded multi-tile grid
            d, m = 5, 8
            x = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
            w = jnp.asarray(rng.normal(size=(n, m)), jnp.float32)
            z = jnp.asarray(rng.choice([-1.0, 1.0], size=(n, m)), jnp.float32)
            alpha = jnp.asarray(rng.normal(size=n), jnp.float32)
            params = {
                "log_variance": jnp.asarray(0.3, jnp.float32),
                "log_lengthscales": jnp.asarray(
                    rng.normal(size=d) * 0.2, jnp.float32),
            }
            g, inv_m = 1.7, 1.0 / m
            kbar64 = 0.5 * g * (
                inv_m * (np.asarray(w, np.float64) @ np.asarray(z, np.float64).T)
                - np.asarray(alpha, np.float64)[:, None]
                * np.asarray(alpha, np.float64)[None, :])
            params64 = {k: jnp.asarray(np.asarray(v), jnp.float64)
                        for k, v in params.items()}
            x64 = jnp.asarray(np.asarray(x), jnp.float64)

            def gram_f64(p):
                return K.gram(kernel, p, x64)

            _, pullback = jax.vjp(gram_f64, params64)
            (want,) = pullback(jnp.asarray(kbar64))
            got = pallas_kgrad(kernel, params, x, w, z, alpha,
                               g=g, inv_m=inv_m, interpret=True, tile=512)
            np.testing.assert_allclose(
                float(got["log_variance"]),
                float(want["log_variance"]), rtol=5e-3,
                err_msg=f"{kernel} n={n} log_variance")
            gl = np.asarray(got["log_lengthscales"], np.float64)
            wl = np.asarray(want["log_lengthscales"], np.float64)
            scale = max(np.max(np.abs(wl)), 1e-3)
            np.testing.assert_allclose(gl, wl, atol=8e-3 * scale, rtol=5e-3,
                                       err_msg=f"{kernel} n={n} lengthscales")


def test_pallas_kmv_tile_not_multiple_of_subchunk():
    """_kmv_body sub-chunks each covariance tile in 256-column pieces; a
    tile_n that is NOT a multiple of 256 must still contract every column
    (the trailing partial chunk gets its own static width)."""
    import numpy as np
    import jax.numpy as jnp

    from gpras_tpu.ops import kernels as K
    from gpras_tpu.ops.pallas_gram import pallas_kmv

    rng = np.random.default_rng(11)
    params = {"log_variance": jnp.asarray(0.1, jnp.float32),
              "log_lengthscales": jnp.asarray(np.log(rng.uniform(0.5, 2.0, 2)),
                                              jnp.float32)}
    x1 = jnp.asarray(rng.normal(size=(500, 2)), jnp.float32)
    v1 = jnp.asarray(rng.normal(size=(500, 3)), jnp.float32)
    kd = np.asarray(K.gram("Matern32", params, x1)) + 0.5 * np.eye(500)
    got = np.asarray(pallas_kmv("Matern32", params, x1, v1,
                                noise=jnp.float32(0.5), interpret=True,
                                tile_m=384, tile_n=384))
    np.testing.assert_allclose(got, kd @ np.asarray(v1), rtol=2e-4, atol=2e-4)


def test_pallas_kmv_symmetric_matches_dense_reference():
    """The symmetric fused matvec (upper-triangle tiles contracted twice,
    ops/pallas_gram._kmv_sym_body) must match the dense f64-gold K @ v for
    every stationary kernel, including a padded remainder tile and r not a
    lane multiple. Interpret mode exercises the sequential per-block-row
    launcher — the same body the compiled aliased grid runs (the compiled
    path is checked against the dense kernel on TPU; see docs)."""
    import numpy as np
    import jax.numpy as jnp

    from gpras_tpu.ops import kernels as K
    from gpras_tpu.ops.pallas_gram import pallas_kmv

    rng = np.random.default_rng(7)
    d = 5
    for kernel, n, r in [("RBF", 2048, 3), ("Matern52", 2100, 3),
                         ("Matern12", 2048, 130), ("Matern32", 2500, 7),
                         ("Exponential", 2048, 3)]:
        params = {
            "log_variance": jnp.asarray(0.2, jnp.float32),
            "log_lengthscales": jnp.asarray(
                np.log(rng.uniform(0.5, 2.0, d)), jnp.float32)}
        x = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(n, r)), jnp.float32)
        kd = np.asarray(K.gram(kernel, params, x), np.float64) \
            + 0.3 * np.eye(n)
        want = kd @ np.asarray(v, np.float64)
        got = np.asarray(pallas_kmv(kernel, params, x, v,
                                    noise=jnp.float32(0.3), interpret=True,
                                    tile_m=256, tile_n=256, sym=True))
        scale = np.max(np.abs(want))
        np.testing.assert_allclose(got, want, atol=2e-5 * scale, rtol=2e-4,
                                   err_msg=f"{kernel} n={n} r={r}")


def test_pallas_kgrad_symmetric_matches_dense_body():
    """The symmetric gradient contraction (folded cotangent
    Kbar_ij + Kbar_ji^T, ops/pallas_gram._kgrad_sym_body) must agree with
    the full-grid body on the same inputs."""
    import numpy as np
    import jax.numpy as jnp

    from gpras_tpu.ops.pallas_gram import pallas_kgrad

    rng = np.random.default_rng(3)
    n, d, m = 1100, 4, 8
    x = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(n, m)), jnp.float32)
    z = jnp.asarray(rng.normal(size=(n, m)), jnp.float32)
    al = jnp.asarray(rng.normal(size=n), jnp.float32)
    for kernel in ("RBF", "Matern52", "Matern12"):
        params = {
            "log_variance": jnp.asarray(0.1, jnp.float32),
            "log_lengthscales": jnp.asarray(
                np.log(rng.uniform(0.5, 2.0, d)), jnp.float32)}
        kw = dict(interpret=True, tile=128)
        gd = pallas_kgrad(kernel, params, x, w, z, al, 0.7, 1.0 / m,
                          sym=False, **kw)
        gs = pallas_kgrad(kernel, params, x, w, z, al, 0.7, 1.0 / m,
                          sym=True, **kw)
        for k in gd:
            a = np.asarray(gd[k], np.float64)
            b = np.asarray(gs[k], np.float64)
            scale = max(np.max(np.abs(a)), 1e-9)
            np.testing.assert_allclose(b, a, atol=3e-5 * scale, rtol=3e-5,
                                       err_msg=f"{kernel} {k}")
