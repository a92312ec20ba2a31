"""Cross-validation harness end-to-end on the synthetic project."""

import json
import sqlite3
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

import fixtures as fx


@pytest.fixture(scope="module")
def cv_setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("cv")
    plans = ["e1", "e2", "e3", "e4"]
    hf = fx.make_project(root / "hf", "hfm", nx=6, ny=6, cell=1.0, plans=plans)
    lf = fx.make_project(root / "lf", "lfm", nx=3, ny=3, cell=2.0, plans=plans)
    fx.write_aoi(root / "aoi.geojson", 0.2, 0.2, 5.8, 5.8)
    # CV re-splits WITHIN the training set: AEP trains, Diverse validates
    rows = [
        {"plan_title": "e1", "event_number": 1, "type": "Train", "set": "AEP"},
        {"plan_title": "e2", "event_number": 2, "type": "Train", "set": "AEP"},
        {"plan_title": "e3", "event_number": 3, "type": "Train", "set": "Diverse"},
        {"plan_title": "e4", "event_number": 4, "type": "Test", "set": "Test"},
    ]
    (root / "event_plans.json").write_text(json.dumps(rows))
    config = {
        "working_directory": str(root / "work"),
        "hf_ras_stac_path": str(hf["stac"]),
        "area_of_interest_path": str(root / "aoi.geojson"),
        "event_plan_path": str(root / "event_plans.json"),
        "mesh_id": fx.MESH_ID,
        "hydraulic_parameter": "wse",
        "wet_threshold_depth": 0.05,
        "spatial_mode_count": 2,
        "kernel": "RBF",
        "inducing_pt_count": 8,
        "optimizer": "adam",
        "induction_pt_initializer": "kmeans",
        "optimizer_kwargs": {"max_iter": 25},
        "generate_plots": False,
        "save_dbs": True,
        "lf_model_type": "ras_upskill",
        "lf_ras_stac_path": str(lf["stac"]),
        "dtype": "float64",
    }
    cfg_path = root / "cv.config.json"
    cfg_path.write_text(json.dumps(config))
    return {"root": root, "config_path": str(cfg_path)}


def test_cv_kernel_sweep(cv_setup):
    from gpras_tpu.pipeline.cross_validation import CVConfig, run_cv_serial, setup

    setup(cv_setup["config_path"])  # pre-extract + preprocessors
    config = CVConfig.from_file(cv_setup["config_path"])
    assert config.train_plans == ["e1", "e2"]
    assert config.test_plans == ["e3"]
    base = Path(config.working_directory) / "kernel"
    run_cv_serial(config, {"kernel": ["RBF", "Matern32"]}, base)
    for i in range(2):
        db = base / str(i) / "performance_metrics.db"
        assert db.exists(), db
        with sqlite3.connect(db) as con:
            scalar = pd.read_sql("select * from scalar_metrics", con)
        assert len(scalar) == 1
        assert np.isfinite(scalar["rmse_aoi_toi"].iloc[0])
        assert (base / str(i) / "config.json").exists()
    # resume: re-running skips existing option dirs without error
    run_cv_serial(config, {"kernel": ["RBF", "Matern32"]}, base)
