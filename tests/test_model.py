"""High-level GPRAS model: vmapped multi-output fit, predict, serialization."""

import numpy as np
import jax.numpy as jnp
import pytest

from gpras_tpu.gp.model import GPRAS

N, D, P, M = 24, 2, 3, 6


def make_data(seed=0, n=N):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, D))
    base = np.sin(x[:, 0]) + 0.3 * x[:, 1]
    y = np.stack([base * (i + 1) + 0.02 * rng.normal(size=n) for i in range(P)], axis=1)
    return x, y


def test_fit_predict_shapes_and_accuracy():
    x, y = make_data()
    model = GPRAS("RBF", dtype=jnp.float64)
    model.fit(x, y, n_inducing=M, optimization_method="adam", max_iter=150)
    mean, var = model.predict(x)
    assert mean.shape == (N, P)
    assert var.shape == (N, P)
    assert np.all(var > 0)
    # mode 0 is low-noise sin; fitted posterior should track it
    rmse = np.sqrt(np.mean((mean - y) ** 2))
    assert rmse < 0.5, rmse


def test_svgp_backend_fit_predict_and_round_trip(tmp_path):
    """model_type='svgp': minibatch fit (one scan program per mode), predict
    from params alone, and the npz round trip (q_mu/q_raw are ordinary
    param leaves)."""
    x, y = make_data(seed=9, n=96)
    model = GPRAS("RBF", model_type="svgp", dtype=jnp.float64)
    model.fit(x, y, n_inducing=M, optimization_method="adam",
              batch_size=24, epochs=200, learning_rate=0.02)
    assert model.fit_info["losses"].shape == (P, 200)
    mean, var = model.predict(x)
    assert mean.shape == (96, P) and np.all(var > 0)
    rmse = np.sqrt(np.mean((mean - y) ** 2))
    assert rmse < 0.6, rmse

    path = tmp_path / "svgp.npz"
    model.to_file(path)
    back = GPRAS.from_file(path)
    assert back.model_type == "svgp"
    m2, v2 = back.predict(x)
    np.testing.assert_allclose(m2, mean, rtol=1e-10)
    np.testing.assert_allclose(v2, var, rtol=1e-10)


def test_svgp_backend_rejects_bad_options():
    x, y = make_data(seed=10)
    model = GPRAS("RBF", model_type="svgp")
    with pytest.raises(ValueError, match="n_inducing"):
        model.fit(x, y, optimization_method="adam")
    with pytest.raises(ValueError, match="minibatch Adam"):
        model.fit(x, y, n_inducing=M, optimization_method="two-stage")
    with pytest.raises(ValueError, match="unsupported svgp fit options"):
        model.fit(x, y, n_inducing=M, optimization_method="adam",
                  tol=1e-3)


def test_exact_backend_beats_prior():
    x, y = make_data(seed=1)
    model = GPRAS("Matern52", model_type="exact", dtype=jnp.float64)
    model.fit(x, y, optimization_method="adam", max_iter=100)
    mean, _ = model.predict(x)
    rmse = np.sqrt(np.mean((mean - y) ** 2))
    assert rmse < 0.5, rmse


def test_serialization_round_trip(tmp_path):
    x, y = make_data(seed=2)
    model = GPRAS("RBF", dtype=jnp.float64)
    model.fit(x, y, n_inducing=M, optimization_method="adam", max_iter=20)
    mean1, var1 = model.predict(x)
    path = tmp_path / "model.npz"
    model.to_file(path)
    loaded = GPRAS.from_file(path)
    assert loaded.kernel_str == "RBF"
    mean2, var2 = loaded.predict(x)
    np.testing.assert_allclose(mean1, mean2, rtol=1e-10)
    np.testing.assert_allclose(var1, var2, rtol=1e-10)


def test_grid_inducing_initializer():
    x, y = make_data(seed=3)
    model = GPRAS("RBF", dtype=jnp.float64)
    model.fit(x, y, n_inducing=M, inducing_initializer="grid",
              optimization_method="adam", max_iter=5)
    assert model.params["z"].shape == (P, M, D)


def test_models_property_exposes_constrained_params():
    x, y = make_data(seed=4)
    model = GPRAS("RBF", dtype=jnp.float64)
    model.fit(x, y, n_inducing=M, optimization_method="adam", max_iter=5)
    ms = model.models
    assert len(ms) == P
    assert all(m["variance"] > 0 for m in ms)
    assert all(m["noise_variance"] > 0 for m in ms)


def test_unknown_kernel_rejected():
    with pytest.raises(ValueError):
        GPRAS("NotAKernel")


def test_predict_before_fit_raises():
    model = GPRAS("RBF")
    with pytest.raises(RuntimeError):
        model.predict(np.zeros((3, D)))


def test_exact_engine_variants_fit_and_predict():
    """Every exact_engine value trains (SAA key for the stochastic ones) and
    produces a posterior close to the dense engine on small data."""
    import numpy as np
    from gpras_tpu.gp.model import GPRAS

    rng = np.random.default_rng(12)
    x = rng.normal(size=(64, 2)).astype(np.float32)
    y = (np.sin(x[:, 0]) + 0.05 * rng.normal(size=64)).astype(np.float32)[:, None]
    xq = rng.normal(size=(16, 2)).astype(np.float32)

    preds = {}
    for engine in ("dense", "lean", "hutchinson", "cg"):
        m = GPRAS("RBF", model_type="exact", exact_engine=engine)
        m.fit(x, y, optimization_method="adam", max_iter=5, learning_rate=0.05)
        mean, var = m.predict(xq)
        assert np.all(np.isfinite(np.asarray(mean)))
        assert np.all(np.asarray(var) > 0)
        preds[engine] = np.asarray(mean)
    for engine in ("lean", "hutchinson", "cg"):
        np.testing.assert_allclose(preds[engine], preds["dense"],
                                   rtol=0.05, atol=0.05, err_msg=engine)


def test_exact_engine_rejects_unknown():
    import pytest
    from gpras_tpu.gp.model import GPRAS

    with pytest.raises(ValueError):
        GPRAS("RBF", model_type="exact", exact_engine="nope")


def test_fit_warm_start_resumes():
    """initial_params resumes training: a second fit started from the first
    fit's parameters reaches a loss at least as good, and a from_file
    checkpoint round-trips into a warm start."""
    import numpy as np
    from gpras_tpu.gp.model import GPRAS

    rng = np.random.default_rng(21)
    x = rng.normal(size=(96, 2)).astype(np.float32)
    y = (np.sin(x[:, 0]) + 0.05 * rng.normal(size=96)).astype(np.float32)[:, None]

    m1 = GPRAS("RBF", model_type="exact")
    m1.fit(x, y, optimization_method="adam", max_iter=8, learning_rate=0.05)
    loss1 = float(np.asarray(m1.fit_info["loss"]))

    m2 = GPRAS("RBF", model_type="exact")
    m2.fit(x, y, optimization_method="adam", max_iter=8, learning_rate=0.05,
           initial_params=m1.params)
    loss2 = float(np.asarray(m2.fit_info["loss"]))
    assert loss2 <= loss1 + 1e-3, (loss1, loss2)

    import tempfile, pathlib
    with tempfile.TemporaryDirectory() as d:
        p = pathlib.Path(d) / "ck.npz"
        m2.to_file(p)
        m3 = GPRAS.from_file(p)
        m3.fit(x, y, optimization_method="adam", max_iter=2,
               learning_rate=0.01, initial_params=m3.params)
        assert np.isfinite(float(np.asarray(m3.fit_info["loss"])))

    import pytest
    with pytest.raises(ValueError):
        m2.fit(x, np.concatenate([y, y], axis=1), optimization_method="adam",
               max_iter=2, initial_params=m1.params)


def test_large_n_multimode_uses_sequential_map(monkeypatch):
    """Above SUPER_THRESHOLD multi-mode exact fits map modes sequentially
    (one (N,N) factor live at a time) and still match the vmap result."""
    import numpy as np
    from gpras_tpu.gp.model import GPRAS

    rng = np.random.default_rng(31)
    x = rng.normal(size=(48, 2)).astype(np.float32)
    y = np.stack([np.sin(x[:, 0]), np.cos(x[:, 1])], axis=1).astype(np.float32)

    m_seq = GPRAS("RBF", model_type="exact", exact_engine="dense")
    monkeypatch.setattr(GPRAS, "SUPER_THRESHOLD", 16)  # force the map path
    m_seq.fit(x, y, optimization_method="adam", max_iter=6, learning_rate=0.05)
    monkeypatch.undo()
    m_vm = GPRAS("RBF", model_type="exact", exact_engine="dense")
    m_vm.fit(x, y, optimization_method="adam", max_iter=6, learning_rate=0.05)
    for k in m_vm.params:
        np.testing.assert_allclose(np.asarray(m_seq.params[k]),
                                   np.asarray(m_vm.params[k]), rtol=1e-5,
                                   err_msg=k)


def test_exact_f32_fit_guards_injected():
    """f32 exact fits get the production guards by default: a NaN-prone
    problem (near-duplicate points, optimizer pushed hard) ends with finite
    params instead of NaN."""
    rng = np.random.default_rng(2)
    x = np.repeat(rng.normal(size=(16, 2)), 2, axis=0)  # duplicated points
    y = np.sin(x[:, 0])
    m = GPRAS("RBF", model_type="exact", dtype=jnp.float32)
    m.fit(x, y, optimization_method="adam", max_iter=300, learning_rate=0.2)
    assert np.all(np.isfinite(np.asarray(m.fit_info["loss"])))
    for v in m.params.values():
        assert np.all(np.isfinite(np.asarray(v)))
    # the floor held
    assert np.asarray(m.params["log_noise_variance"]).ravel()[0] \
        >= np.log(1e-4) - 1e-6


def test_warm_start_subsample_exact():
    """warm_start_subsample first fits on a uniform subsample, then the full
    set from those params; the result should be at least as good as a cold
    short fit of the same budget."""
    rng = np.random.default_rng(4)
    n = 256
    x = rng.normal(size=(n, 2))
    y = np.sin(2 * x[:, 0]) + 0.05 * rng.normal(size=n)
    cold = GPRAS("RBF", model_type="exact", dtype=jnp.float64)
    cold.fit(x, y, optimization_method="adam", max_iter=40)
    warm = GPRAS("RBF", model_type="exact", dtype=jnp.float64)
    warm.fit(x, y, optimization_method="adam", max_iter=40,
             warm_start_subsample=64)
    assert float(np.asarray(warm.fit_info["loss"]).ravel()[0]) <= \
        float(np.asarray(cold.fit_info["loss"]).ravel()[0]) + 1e-6
    # predictions still work end-to-end
    mean, var = warm.predict(x[:10])
    assert np.all(np.isfinite(mean)) and np.all(np.asarray(var) >= 0)


def test_fit_exact_distributed_mesh_matches_single_chip():
    """One-call distributed fit (mesh='auto' -> (4, 2) 2-D mesh on the 8
    virtual devices) reaches the single-chip fit's loss and predictions —
    the GPRAS.fit extension of the reference one-call contract
    (gpras/gpr.py:237) over parallel/pexact."""
    rng = np.random.default_rng(7)
    n = 256
    x = rng.normal(size=(n, 3))
    base = np.sin(1.5 * x[:, 0]) + 0.4 * x[:, 1]
    y = np.stack([base, base * 0.5 + 0.1], axis=1)
    y += 0.05 * rng.normal(size=y.shape)
    kw = dict(optimization_method="adam", max_iter=60, learning_rate=0.05)
    single = GPRAS("RBF", model_type="exact", dtype=jnp.float64)
    single.fit(x, y, **kw)
    dist = GPRAS("RBF", model_type="exact", dtype=jnp.float64)
    dist.fit(x, y, mesh="auto", **kw)
    assert dist.fit_info["dist_engine"] == "dense"
    assert tuple(dist.fit_info["dist_mesh_shape"]) == (4, 2)
    l_s = np.asarray(single.fit_info["loss"]).ravel()
    l_d = np.asarray(dist.fit_info["loss"]).ravel()
    np.testing.assert_allclose(l_d, l_s, rtol=1e-5)
    m_s, _ = single.predict(x[:16])
    m_d, _ = dist.predict(x[:16])
    np.testing.assert_allclose(m_d, m_s, rtol=1e-4, atol=1e-6)
    # checkpoint format is unchanged by the distributed path
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "m.npz")
        dist.to_file(p)
        back = GPRAS.from_file(p)
        m_b, _ = back.predict(x[:16])
        np.testing.assert_allclose(m_b, m_d, rtol=1e-6)


def test_fit_exact_distributed_cg_engine():
    """Forcing exact_engine='cg' with a 2-D mesh flattens to the 1-D
    row-sharded matrix-free engine and still fits."""
    rng = np.random.default_rng(8)
    n = 256
    x = rng.normal(size=(n, 2))
    y = np.sin(x[:, 0]) + 0.1 * rng.normal(size=n)
    m = GPRAS("Matern52", model_type="exact", exact_engine="cg",
              dtype=jnp.float64)
    m.fit(x, y, mesh="auto", optimization_method="adam", max_iter=25,
          learning_rate=0.05, probes=4, cg_iters=24, precond_rank=0)
    assert m.fit_info["dist_engine"] == "cg"
    losses = np.asarray(m.fit_info["loss"]).ravel()
    assert np.all(np.isfinite(losses))
    mean, var = m.predict(x[:8])
    assert np.all(np.isfinite(mean)) and np.all(np.asarray(var) >= 0)


def test_fit_mesh_rejects_sparse_backend():
    x, y = make_data()
    m = GPRAS("RBF", dtype=jnp.float64)
    with pytest.raises(ValueError, match="mesh-distributed"):
        m.fit(x, y, n_inducing=M, mesh="auto")
