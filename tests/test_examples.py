"""The shipped examples must actually run (tiny sizes)."""

from __future__ import annotations

import importlib.util
import os

import numpy as np

_EX = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "examples")


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(_EX, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_quickstart_example(tmp_path):
    qs = _load("quickstart")
    rmse, cover = qs.main(n_events=24, n_cells=300, n_modes=2, n_inducing=8,
                          max_iter=10, checkpoint=str(tmp_path / "gpr.npz"),
                          verbose=False)
    assert np.isfinite(rmse) and rmse < 5.0
    assert 0.0 <= cover <= 1.0


def test_serving_example():
    sv = _load("serving")
    lat = sv.main(verbose=False, n_events=40, n_cells=300, n_modes=2,
                  n_inducing=8, max_iter=10)
    assert set(lat) == {1, 5, 17, 32}
    assert all(dt > 0 for dt in lat.values())


def test_cold_fit_example():
    cf = _load("cold_fit")
    rmse, cover, info = cf.main(n=512, d=3, max_iter=8, chunk=4,
                                verbose=False)
    assert np.isfinite(rmse) and rmse < 1.0
    assert 0.5 <= cover <= 1.0
    assert info["engine"] == "hutchinson"


def test_cli_predict_from_artifacts(tmp_path):
    from gpras_tpu.__main__ import main

    sv = _load("serving")
    model, hf, lf = sv.train_and_save(str(tmp_path), n_events=24, n_cells=300,
                                      n_modes=2, n_inducing=8, max_iter=10)
    _, lf_fields, _ = sv.make_synthetic_flood(24, 300, seed=5)
    np.savez(tmp_path / "in.npz", fields=lf_fields[:9])
    out = tmp_path / "out.npz"
    rc = main(["predict", model, str(tmp_path / "in.npz"), str(out),
               "--hf-pre", hf, "--lf-pre", lf, "--batch", "4"])
    assert rc == 0
    with np.load(out) as z:
        assert z["field"].shape == (9, 300)
        assert z["field_var"].shape == (9, 300)
        assert np.all(np.isfinite(z["field"]))
        assert np.all(z["field_var"] >= 0.0)


def test_streaming_svgp_example():
    ss = _load("streaming_svgp")
    rmse_sub, rmse_ref, cover = ss.main(n_events=512, n_sub=128,
                                        n_inducing=16, sgpr_iters=40,
                                        epochs=6, batch_size=64,
                                        verbose=False)
    assert np.isfinite(rmse_ref)
    # refinement on the full archive must not be worse than the subsample fit
    assert rmse_ref < rmse_sub * 1.1, (rmse_ref, rmse_sub)
    assert 0.0 <= cover <= 1.0


def test_distributed_example():
    df = _load("distributed_fit")
    loss2d, losses_h = df.main(verbose=False, b=8, steps=1)
    assert np.isfinite(loss2d)
    assert np.all(np.isfinite(losses_h))
