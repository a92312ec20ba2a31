"""Metric suite vs hand-computed small arrays and the SQLite export schema."""

import sqlite3

import numpy as np
import jax.numpy as jnp
import pandas as pd

from gpras_tpu.metrics import compute_event_metrics, export_metric_summary
from gpras_tpu.metrics import metrics as mm

# 3 timesteps x 2 cells, hand-checkable
X = np.array([[1.0, 0.0], [3.0, 2.0], [2.0, 1.0]])
Y = np.array([[1.0, 1.0], [2.0, 1.0], [4.0, 0.0]])
CONF = np.array([[0.1, 0.2], [0.3, 0.4], [0.5, 0.6]])


def test_rmse_mae_err_toi():
    d = X - Y
    np.testing.assert_allclose(float(mm.rmse_aoi_toi(jnp.asarray(X), jnp.asarray(Y))),
                               np.sqrt(np.mean(d**2)))
    np.testing.assert_allclose(float(mm.mae_aoi_toi(jnp.asarray(X), jnp.asarray(Y))),
                               np.mean(np.abs(d)))
    np.testing.assert_allclose(float(mm.err_aoi_toi(jnp.asarray(X), jnp.asarray(Y))),
                               np.mean(d))
    np.testing.assert_allclose(float(mm.conf_aoi_toi(jnp.asarray(CONF))), np.mean(CONF))


def test_peak_metrics():
    # x peaks: cell0 t=1 (3.0), cell1 t=1 (2.0); y peaks: cell0 t=2 (4.0), cell1 t=0/1 (1.0 at t=0)
    x_peak = np.array([3.0, 2.0])
    y_peak = np.array([4.0, 1.0])
    m = compute_event_metrics(jnp.asarray(X), jnp.asarray(Y), jnp.asarray(CONF),
                              depth_threshold=1.5)
    np.testing.assert_allclose(float(m["rmse_aoi_mts"]),
                               np.sqrt(np.mean((x_peak - y_peak) ** 2)))
    np.testing.assert_allclose(float(m["err_aoi_mts"]), np.mean(x_peak - y_peak))
    nse = 1 - np.sum((x_peak - y_peak) ** 2) / np.sum((x_peak - x_peak.mean()) ** 2)
    np.testing.assert_allclose(float(m["nse_aoi_mts"]), nse)
    np.testing.assert_allclose(np.asarray(m["err_cell_mts"]), x_peak - y_peak)


def test_contingency_at_threshold():
    # threshold 1.5: x wet = [T, T]; y wet = [T, F] -> a=1 detected, b=0 fa, c=1 miss
    m = compute_event_metrics(jnp.asarray(X), jnp.asarray(Y), jnp.asarray(CONF),
                              depth_threshold=1.5)
    np.testing.assert_allclose(float(m["pod_mts"]), 1 / 2)
    np.testing.assert_allclose(float(m["rfa_mts"]), 0.0)
    # csi = 1/((1/pod)+(1/(1-rfa))-1) = 1/(2+1-1) = 0.5
    np.testing.assert_allclose(float(m["csi_mts"]), 0.5)
    np.testing.assert_allclose(float(m["f2_mts"]), (1 - 1) / 2)  # (a-c)/(a+b+c)
    np.testing.assert_allclose(float(m["f3_mts"]), (1 - 0) / 2)  # (a-b)/(a+b+c)


def test_f_scores_empty_denominator_returns_one():
    x = np.zeros((3, 2))
    y = np.zeros((3, 2))
    m = compute_event_metrics(jnp.asarray(x), jnp.asarray(y), jnp.asarray(CONF),
                              depth_threshold=0.5)
    assert float(m["f2_mts"]) == 1.0
    assert float(m["f3_mts"]) == 1.0


def test_fidelity_index_tolerances():
    x = jnp.asarray(X)
    # exact match within tolerance 0 only where x==y: only (0,0)
    fi0 = float(mm.fi_aoi_toi(x, jnp.asarray(Y), 0, 0.0))
    np.testing.assert_allclose(fi0, 1 / 6)
    # v_tol=1 matches |x-y|<=1: differences are [0,1,1,1,2,1] -> 5/6
    fi1 = float(mm.fi_aoi_toi(x, jnp.asarray(Y), 0, 1.0))
    np.testing.assert_allclose(fi1, 5 / 6)
    # time shifting only ever updates rows [:-i] (reference gpras/metrics.py:197-202),
    # so the (2,0) mismatch in the last row stays unmatched: still 5/6
    fi_t = float(mm.fi_aoi_toi(x, jnp.asarray(Y), 1, 1.0))
    np.testing.assert_allclose(fi_t, 5 / 6)


def test_timeseries_and_cell_metrics():
    m = compute_event_metrics(jnp.asarray(X), jnp.asarray(Y), jnp.asarray(CONF))
    d = X - Y
    np.testing.assert_allclose(np.asarray(m["rmse_aoi_ts"]),
                               np.sqrt(np.mean(d**2, axis=1)))
    np.testing.assert_allclose(np.asarray(m["err_aoi_ts"]), np.mean(d, axis=1))
    np.testing.assert_allclose(np.asarray(m["conf_aoi_ts"]), np.mean(CONF, axis=1))
    np.testing.assert_allclose(np.asarray(m["rmse_cell_toi"]),
                               np.sqrt(np.mean(d**2, axis=0)))
    np.testing.assert_allclose(np.asarray(m["err_cell_toi"]), np.mean(d, axis=0))
    np.testing.assert_allclose(np.asarray(m["conf_cell_toi"]), np.mean(CONF, axis=0))


def test_velocity_mode_nans_contingency():
    m = compute_event_metrics(jnp.asarray(X), jnp.asarray(Y), jnp.asarray(CONF),
                              contingency=False)
    assert np.isnan(float(m["pod_mts"]))
    assert np.isnan(float(m["rfa_mts"]))
    assert np.isnan(float(m["csi_mts"]))


def test_export_metric_summary_sqlite_schema(tmp_path):
    idx = pd.MultiIndex.from_product([["e1", "e2"], [0, 1, 2]],
                                     names=["event", "timestep"])
    cols = ["c0", "c1"]
    x_all = pd.DataFrame(np.vstack([X, X * 1.1]), index=idx, columns=cols)
    y_all = pd.DataFrame(np.vstack([Y, Y * 1.1]), index=idx, columns=cols)
    conf_all = pd.DataFrame(np.vstack([CONF, CONF]), index=idx, columns=cols)
    db = tmp_path / "metrics.db"
    export_metric_summary(x_all, y_all, conf_all, db, depth_threshold=1.5)
    with sqlite3.connect(db) as con:
        scalar = pd.read_sql("select * from scalar_metrics", con)
        ts = pd.read_sql("select * from timeseries_metrics", con)
        cells = pd.read_sql("select * from cell_metrics", con)
    assert set(scalar["event"]) == {"e1", "e2"}
    for c in mm.SCALAR_COLUMNS:
        assert c in scalar.columns
    assert len(ts) == 6 and len(cells) == 4
    for c in mm.TS_COLUMNS:
        assert c in ts.columns
    for c in mm.CELL_COLUMNS:
        assert c in cells.columns
