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


def test_distributed_example():
    df = _load("distributed_fit")
    loss2d, losses_h = df.main(verbose=False, b=8, steps=1)
    assert np.isfinite(loss2d)
    assert np.all(np.isfinite(losses_h))
