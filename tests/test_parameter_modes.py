"""Pipeline behavior for hydraulic_parameter = depth and velocity."""

import json

import numpy as np
import pytest

import fixtures as fx


@pytest.fixture(scope="module")
def projects(tmp_path_factory):
    root = tmp_path_factory.mktemp("modes")
    plans = ["e1", "e2", "e3"]
    hf = fx.make_project(root / "hf", "hfm", nx=6, ny=6, cell=1.0, plans=plans)
    lf = fx.make_project(root / "lf", "lfm", nx=3, ny=3, cell=2.0, plans=plans)
    fx.write_aoi(root / "aoi.geojson", 0.2, 0.2, 5.8, 5.8)
    ep = root / "event_plans.json"
    fx.write_event_plans(ep, train=["e1", "e3"], test=["e2"])
    return {"hf": hf, "lf": lf, "root": root, "ep": ep}


def _config(projects, tmp_path, **overrides):
    from gpras_tpu.pipeline.config import Config

    base = dict(
        working_directory=str(tmp_path / "work"),
        hf_ras_stac_path=str(projects["hf"]["stac"]),
        area_of_interest_path=str(projects["root"] / "aoi.geojson"),
        event_plan_path=str(projects["ep"]),
        mesh_id=fx.MESH_ID,
        hydraulic_parameter="wse",
        wet_threshold_depth=0.05,
        spatial_mode_count=2,
        kernel="RBF",
        inducing_pt_count=10,
        optimizer="adam",
        induction_pt_initializer="kmeans",
        optimizer_kwargs={"max_iter": 30},
        generate_plots=False,
        save_dbs=False,
        lf_model_type="ras_upskill",
        lf_ras_stac_path=str(projects["lf"]["stac"]),
        dtype="float64",
    )
    base.update(overrides)
    return Config(**base)


def test_depth_mode_pipeline(projects, tmp_path):
    from gpras_tpu.pipeline.pipeline import pipeline

    config = _config(projects, tmp_path, hydraulic_parameter="depth")
    summary = pipeline(config)
    assert np.isfinite(summary["depth_rmse"])
    import sqlite3

    import pandas as pd

    with sqlite3.connect(config.metric_db_path) as con:
        scalar = pd.read_sql("select * from scalar_metrics", con)
    # depth mode keeps the contingency metrics
    assert np.isfinite(scalar["pod_mts"].iloc[0])


def test_velocity_mode_pipeline(projects, tmp_path):
    from gpras_tpu.pipeline.pipeline import pipeline

    config = _config(projects, tmp_path, hydraulic_parameter="velocity")
    summary = pipeline(config)
    assert np.isfinite(summary["depth_rmse"])
    import sqlite3

    import pandas as pd

    with sqlite3.connect(config.metric_db_path) as con:
        scalar = pd.read_sql("select * from scalar_metrics", con)
    # velocity mode NaNs the contingency metrics (reference gpras/metrics.py:49-51;
    # NaN round-trips through SQLite as NULL -> None)
    assert pd.isna(scalar["pod_mts"].iloc[0])


def test_exact_backend_pipeline(projects, tmp_path):
    from gpras_tpu.pipeline.pipeline import pipeline

    config = _config(projects, tmp_path, model_backend="exact")
    summary = pipeline(config)
    assert np.isfinite(summary["depth_rmse"])


def test_plots_generation_smoke(projects, tmp_path):
    from gpras_tpu.pipeline.pipeline import pipeline

    config = _config(projects, tmp_path, generate_plots=True, save_dbs=True)
    pipeline(config)
    plot_dir = config.plot_dir
    assert (plot_dir / "pairplot.png").exists()
    assert (plot_dir / "pca_variance.png").exists()
    assert (plot_dir / "performance_scatterplot.png").exists()
    assert any((plot_dir / "error_maps").glob("*_rmse.png"))
    assert any((plot_dir / "error_maps").glob("*_detection.png"))
    assert any(plot_dir.glob("eof_*.png"))
    assert any((plot_dir / "temporal_clipping").glob("*.png"))
