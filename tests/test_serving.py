"""Serving-side predictor: bucketing, warmup, full-field composition."""

import numpy as np
import jax.numpy as jnp

from gpras_tpu.eof.preprocessor import PreProcessor
from gpras_tpu.gp.model import GPRAS
from gpras_tpu.gp.serving import PosteriorPredictor


def test_predictor_round_trip(tmp_path):
    rng = np.random.default_rng(0)
    n, d, p = 30, 2, 2
    x = rng.normal(size=(n, d))
    y = np.stack([np.sin(x[:, 0]) * (i + 1) for i in range(p)], axis=1)
    model = GPRAS("RBF", dtype=jnp.float64)
    model.fit(x, y, n_inducing=8, optimization_method="adam", max_iter=20)
    path = tmp_path / "gpr.npz"
    model.to_file(path)

    pred = PosteriorPredictor(path, buckets=(16, 64))
    mean_direct, var_direct = model.predict(x)
    mean_served, var_served = pred.predict_modes(x)  # n=30 -> bucket 64 (padded)
    np.testing.assert_allclose(mean_served, mean_direct, rtol=1e-8)
    np.testing.assert_allclose(var_served, var_direct, rtol=1e-8)
    # small batch -> smaller bucket, same values
    m2, v2 = pred.predict_modes(x[:5])
    np.testing.assert_allclose(m2, mean_direct[:5], rtol=1e-8)
    pred.warmup()


def test_predictor_serves_svgp_backend(tmp_path):
    """The serving path is backend-agnostic: an svgp checkpoint (variational
    params ARE the state — no factor cache) serves through the same
    bucketed predictor."""
    rng = np.random.default_rng(3)
    n, d, p = 48, 2, 2
    x = rng.normal(size=(n, d))
    y = np.stack([np.sin(x[:, 0]) * (i + 1) for i in range(p)], axis=1)
    model = GPRAS("RBF", model_type="svgp", dtype=jnp.float64)
    model.fit(x, y, n_inducing=8, optimization_method="adam",
              batch_size=16, epochs=40, natgrad=0.5)
    path = tmp_path / "svgp.npz"
    model.to_file(path)

    pred = PosteriorPredictor(path, buckets=(16, 64))
    mean_direct, var_direct = model.predict(x)
    mean_served, var_served = pred.predict_modes(x)
    np.testing.assert_allclose(mean_served, mean_direct, rtol=1e-8)
    np.testing.assert_allclose(var_served, var_direct, rtol=1e-8)


def test_predict_field_composes_preprocessors(tmp_path):
    rng = np.random.default_rng(1)
    s, c = 40, 50
    t = np.linspace(0, 1, s)
    field = np.outer(np.sin(2 * np.pi * t), rng.normal(size=c)) * 3 + 10
    elev = np.full(c, -50.0)
    pre = PreProcessor(hydraulic_parameter="wse")
    pre.fit(field, elev, spatial_mode_count=3)
    modes = pre.transform(field)
    model = GPRAS("RBF", dtype=jnp.float64)
    model.fit(modes, modes, n_inducing=8, optimization_method="adam", max_iter=30)
    model.to_file(tmp_path / "gpr.npz")
    pre.to_file(tmp_path / "pre.npz")

    # identity upskilling: LF and HF share one preprocessor — passed
    # EXPLICITLY for both roles (no silent HF fallback)
    pred = PosteriorPredictor(tmp_path / "gpr.npz",
                              hf_preprocessor_path=tmp_path / "pre.npz",
                              lf_preprocessor_path=tmp_path / "pre.npz",
                              buckets=(64,))
    out_field, out_var = pred.predict_field(field)
    assert out_field.shape == field.shape
    assert out_var.shape == field.shape
    assert np.all(out_var >= 0)
    # identity-ish mapping: reconstruction should track the input closely
    rmse = np.sqrt(np.mean((out_field - field) ** 2))
    assert rmse < 1.0, rmse


def test_predictor_with_hms_lf_preprocessor(tmp_path):
    """The LF preprocessor artifact's class tag selects HmsPreProcessor, and
    omitting the LF path makes predict_field refuse (no silent HF fallback)."""
    import pytest
    from gpras_tpu.eof.preprocessor import HmsPreProcessor, PreProcessor
    from gpras_tpu.gp.model import GPRAS
    from gpras_tpu.gp.serving import PosteriorPredictor

    rng = np.random.default_rng(3)
    s, c = 48, 30
    field = np.outer(np.sin(np.linspace(0, 2, s)), rng.normal(size=c)) * 2 + 5
    elev = np.full(c, -10.0)
    hf_pre = PreProcessor(hydraulic_parameter="wse")
    hf_pre.fit(field, elev, spatial_mode_count=2)
    y = hf_pre.transform(field)

    forcing = np.abs(rng.normal(size=(s, 6)))
    bc_mask = np.array([True] * 2 + [False] * 4)
    lf_pre = HmsPreProcessor()
    lf_pre.fit(forcing, bc_mask=bc_mask, precip_mask=~bc_mask)
    x = lf_pre.transform(forcing)

    model = GPRAS("RBF", dtype=jnp.float64)
    model.fit(x, y, n_inducing=8, optimization_method="adam", max_iter=20)
    model.to_file(tmp_path / "gpr.npz")
    hf_pre.to_file(tmp_path / "hf.npz")
    lf_pre.to_file(tmp_path / "lf.npz")

    pred = PosteriorPredictor(tmp_path / "gpr.npz",
                              hf_preprocessor_path=tmp_path / "hf.npz",
                              lf_preprocessor_path=tmp_path / "lf.npz",
                              buckets=(64,))
    assert isinstance(pred.lf_pre, HmsPreProcessor)
    out_field, out_var = pred.predict_field(forcing)
    assert out_field.shape == (s, c)
    assert np.all(np.isfinite(out_field))

    bare = PosteriorPredictor(tmp_path / "gpr.npz",
                              hf_preprocessor_path=tmp_path / "hf.npz",
                              buckets=(64,))
    with pytest.raises(RuntimeError, match="preprocessor"):
        bare.predict_field(forcing)


def test_device_field_decoder_matches_reverse_transform():
    """make_field_decoder == PreProcessor.reverse_transform bit-for-math,
    for both hydraulic parameters, with weights and dry cells."""
    from gpras_tpu.gp.serving import field_decoder_from_preprocessor

    rng = np.random.default_rng(7)
    s, c = 25, 60
    t = np.linspace(0, 1, s)
    base = (np.outer(np.sin(2 * np.pi * t), rng.normal(size=c)) * 2
            + np.outer(np.cos(3 * t), rng.normal(size=c)))
    elev = rng.normal(size=c) * 0.1
    for hp in ("wse", "depth"):
        field = base + (8.0 if hp == "wse" else 0.0)
        if hp == "depth":
            field = np.abs(field)
        field[:, :5] = elev[:5] if hp == "wse" else 0.0  # always-dry cells
        pre = PreProcessor(hydraulic_parameter=hp)
        pre.fit(field, elev, weights=np.abs(rng.normal(size=c)) + 0.5,
                spatial_mode_count=4)
        mean = rng.normal(size=(s, pre.spatial_mode_count))
        var = np.abs(rng.normal(size=mean.shape))
        ref_mean, ref_var = pre.reverse_transform(mean, var)
        decode = field_decoder_from_preprocessor(pre)
        dev_mean, dev_var = decode(jnp.asarray(mean), jnp.asarray(var))
        np.testing.assert_allclose(np.asarray(dev_mean), ref_mean, rtol=1e-10)
        np.testing.assert_allclose(np.asarray(dev_var), ref_var, rtol=1e-10)
        mean_only = decode(jnp.asarray(mean))
        np.testing.assert_allclose(np.asarray(mean_only), ref_mean, rtol=1e-10)


def test_predict_field_device_decode_matches_host(tmp_path):
    rng = np.random.default_rng(5)
    s, c = 30, 40
    t = np.linspace(0, 1, s)
    field = np.outer(np.sin(2 * np.pi * t), rng.normal(size=c)) * 3 + 10
    pre = PreProcessor(hydraulic_parameter="wse")
    pre.fit(field, np.full(c, -50.0), spatial_mode_count=3)
    modes = pre.transform(field)
    model = GPRAS("RBF", dtype=jnp.float64)
    model.fit(modes, modes, n_inducing=8, optimization_method="adam",
              max_iter=20)
    model.to_file(tmp_path / "gpr.npz")
    pre.to_file(tmp_path / "pre.npz")
    pred = PosteriorPredictor(tmp_path / "gpr.npz",
                              hf_preprocessor_path=tmp_path / "pre.npz",
                              lf_preprocessor_path=tmp_path / "pre.npz",
                              buckets=(64,))
    f_dev, v_dev = pred.predict_field(field)  # device decode (default)
    f_host, v_host = pred.predict_field(field, device_decode=False)
    np.testing.assert_allclose(f_dev, f_host, rtol=1e-10)
    np.testing.assert_allclose(v_dev, v_host, rtol=1e-10)
