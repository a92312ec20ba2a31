"""DataBuilders on synthetic HEC-RAS projects + the end-to-end pipeline slice."""

import json
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

import fixtures as fx
from gpras_tpu.data.builders import (
    DataBuilder,
    RasInterpolaterBuilder,
    RasUpskillDataBuilder,
)
from gpras_tpu.data.geometry import Polygon
from gpras_tpu.data.ras_model import RasModel
from gpras_tpu.data.reader import RasReader


@pytest.fixture(scope="module")
def projects(tmp_path_factory):
    root = tmp_path_factory.mktemp("proj")
    plans = ["e1", "e2", "e3", "e4"]
    hf = fx.make_project(root / "hf", "hfm", nx=8, ny=8, cell=1.0, plans=plans,
                         seed=0)
    lf = fx.make_project(root / "lf", "lfm", nx=4, ny=4, cell=2.0, plans=plans,
                         seed=0, elevation_fn=lambda c: 1.0 + 0.1 * c[:, 0])
    aoi_path = root / "aoi.geojson"
    fx.write_aoi(aoi_path, 0.2, 0.2, 7.8, 7.8)
    return {"hf": hf, "lf": lf, "aoi": aoi_path, "plans": plans, "root": root}


def _builder(projects, cls=RasUpskillDataBuilder, plans=None):
    hf_model = RasModel.from_stac(projects["hf"]["stac"])
    lf_model = RasModel.from_stac(projects["lf"]["stac"])
    aoi = Polygon.from_geojson_file(projects["aoi"])
    return cls(hf_ras=hf_model, lf_ras=lf_model, mesh_id=fx.MESH_ID,
               plans=plans or projects["plans"], area_of_interest=aoi)


def test_upskill_builder_alignment_and_clipping(projects):
    b = _builder(projects)
    hf_df, lf_df = b.aligned_datasets
    assert hf_df.shape == lf_df.shape
    assert hf_df.index.names == ["run", "t"]
    assert set(hf_df.index.get_level_values("run")) == set(projects["plans"])
    # temporal clipping removed warmup/recession
    assert len(hf_df) < 40 * len(projects["plans"])
    assert len(hf_df) > 0
    # LF resampled onto HF cells: same columns
    assert list(hf_df.columns) == list(lf_df.columns)
    # clamped at HF ground elevation
    elev = b.cell_elevations
    assert np.all(lf_df.values >= elev[None, :] - 1e-5)


def test_upskill_resampler_pairs_nearest_lf_cell(projects):
    b = _builder(projects)
    # HF cell centroids and their paired LF cells: the LF cell must contain the
    # HF centroid (2x2 coarsening => exact containment)
    hf_cents = b.hf_centroids_aoi
    lf_cents = b._lf_mesh.centroids[b._lf_mesh.cell_ids.searchsorted(b.lf_resampler)]
    assert np.all(np.abs(hf_cents - lf_cents).max(axis=1) <= 1.0 + 1e-9)


def test_interpolater_builder_produces_smooth_lf(projects):
    b = _builder(projects, cls=RasInterpolaterBuilder)
    lf = b.get_lf_plan_data("e1")
    assert lf.shape[1] == len(b.hf_resampler)
    assert np.all(np.isfinite(lf.values))
    assert np.all(lf.values >= b.cell_elevations[None, :] - 1e-5)


def test_export_db_and_reader_round_trip(projects, tmp_path):
    b = _builder(projects)
    db = tmp_path / "train.db"
    b.export_db(str(db))
    assert RasReader.is_valid(str(db))
    r = RasReader(str(db))
    hf_df, lf_df = r.aligned_datasets
    hf_b, lf_b = b.aligned_datasets
    pd.testing.assert_frame_equal(hf_df, hf_b)
    np.testing.assert_allclose(r.cell_elevations, b.cell_elevations)
    np.testing.assert_allclose(r.cell_areas, b.cell_areas)
    np.testing.assert_array_equal(r.lf_resampler, b.lf_resampler)
    assert not RasReader.is_valid(str(tmp_path / "nope"))


def test_cutoff_logic_on_synthetic_pulse():
    b = DataBuilder.__new__(DataBuilder)
    b.flow_convergence_threshold = 0.95
    t = np.linspace(0, 1, 100)
    pulse = np.exp(-((t - 0.5) ** 2) / 0.01)[:, None] * np.ones((1, 3))
    start, stop = b.get_cutoff(pulse)
    assert 0 < start < 50 < stop < 100


def test_cutoff_trims_nan_tail():
    b = DataBuilder.__new__(DataBuilder)
    b.flow_convergence_threshold = 0.95
    t = np.linspace(0, 1, 100)
    pulse = np.exp(-((t - 0.3) ** 2) / 0.01)[:, None] * np.ones((1, 2))
    pulse[80:, 1] = np.nan
    start, stop = b.get_cutoff(pulse)
    assert stop <= 80


def test_end_to_end_pipeline_ras_upskill(projects, tmp_path):
    """SURVEY.md section 7.3's minimum end-to-end slice, on synthetic data:
    extract -> EOF -> vmapped GP fit -> batched posterior -> reverse transform
    -> metrics + timers."""
    from gpras_tpu.pipeline.config import Config
    from gpras_tpu.pipeline.pipeline import pipeline

    work = tmp_path / "work"
    event_plans = tmp_path / "event_plans.json"
    # interpolative split: the test event amplitude lies inside the train range
    fx.write_event_plans(event_plans, train=["e1", "e2", "e4"], test=["e3"])
    config = Config(
        working_directory=str(work),
        hf_ras_stac_path=str(projects["hf"]["stac"]),
        area_of_interest_path=str(projects["aoi"]),
        event_plan_path=str(event_plans),
        mesh_id=fx.MESH_ID,
        hydraulic_parameter="wse",
        wet_threshold_depth=0.05,
        spatial_mode_count=3,
        kernel="RBF",
        inducing_pt_count=12,
        optimizer="adam",
        induction_pt_initializer="kmeans",
        optimizer_kwargs={"max_iter": 60},
        generate_plots=False,
        save_dbs=True,
        lf_model_type="ras_upskill",
        lf_ras_stac_path=str(projects["lf"]["stac"]),
        dtype="float64",
    )
    summary = pipeline(config)
    # artifacts exist
    assert (work / "model" / "gpr.npz").exists()
    assert (work / "model" / "hf_preprocessor.npz").exists()
    assert (work / "model" / "timers.json").exists()
    assert (work / "metrics" / "performance_metrics.db").exists()
    timers = json.loads((work / "model" / "timers.json").read_text())
    assert set(timers) == {"load_data", "preprocess_data", "fit_model",
                           "make_predictions"}
    # the GP-upskilled field must beat... at least be sane: finite, and better
    # than the raw LF input on depth RMSE
    assert np.isfinite(summary["depth_rmse"])
    import sqlite3

    with sqlite3.connect(work / "metrics" / "performance_metrics.db") as con:
        scalar = pd.read_sql("select * from scalar_metrics", con)
    assert len(scalar) == 1  # one test event
    assert scalar["rmse_aoi_toi"].iloc[0] < 0.6
    # second run replays the parquet DB (cache hit) and reuses artifacts
    summary2 = pipeline(config)
    assert np.isclose(summary2["depth_rmse"], summary["depth_rmse"], rtol=0.2)
