"""HMS-upskill and pseudo-surface builders end-to-end on FakeDss fixtures."""

from datetime import datetime, timedelta
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

import fixtures as fx
from gpras_tpu.data.dss import FakeDss, FakeRecord, set_dss_factory
from gpras_tpu.data.geometry import Polygon
from gpras_tpu.data.ras_model import RasModel

PLANS = ["e1", "e2", "e3"]
T_STEPS = 40


def _register_hms_dss(root: Path, plans=PLANS):
    """Per-plan inflow + precip-grid DSS contents."""
    times = [datetime(2020, 1, 1) + timedelta(hours=h) for h in range(T_STEPS)]
    inflow_dir = root / "inflow_dss"
    precip_dir = root / "precip_dss"
    for i, plan in enumerate(plans):
        q = fx.hydrograph(T_STEPS, peak=100.0 * (1 + i))
        FakeDss.register(str(inflow_dir / f"{plan}.dss"), {
            "/TRIN/west-fork_s340/FLOW/01JAN2020/1HOUR/RUN:X/":
                FakeRecord(values=q, times=times),
            "/TRIN/west-fork_s340/FLOW-BASE/01JAN2020/1HOUR/RUN:X/":
                FakeRecord(values=0.2 * q, times=times),
            "/TRIN/outlet_hms/FLOW/01JAN2020/1HOUR/RUN:X/":
                FakeRecord(values=0.9 * q, times=times),
        })
        grids = {}
        rng = np.random.default_rng(10 + i)
        for h in range(T_STEPS):
            stamp = times[h].strftime("%d%b%Y:%H%M").upper()
            grids[f"/SHG/PRECIP/EXCESS/{stamp}/X/GPR/"] = FakeRecord(
                data=np.abs(rng.normal(0.5, 0.2, size=(8, 8))).astype(np.float32),
                cellSize=1.0, numberOfCellsX=8, numberOfCellsY=8,
                lowerLeftCellX=0, lowerLeftCellY=0, srsDefinition="LOCAL")
        FakeDss.register(str(precip_dir / f"{plan}.dss"), grids)
    return str(inflow_dir), str(precip_dir)


@pytest.fixture(scope="module")
def hms_setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("hms")
    hf = fx.make_project(root / "hf", "hfm", nx=6, ny=6, cell=1.0, plans=PLANS)
    inflow_dir, precip_dir = _register_hms_dss(root)
    aoi = root / "aoi.geojson"
    fx.write_aoi(aoi, 0.2, 0.2, 5.8, 5.8)
    set_dss_factory(FakeDss)
    yield {"root": root, "hf": hf, "inflow": inflow_dir, "precip": precip_dir,
           "aoi": aoi}
    set_dss_factory(None)


def _hms_builder(hms_setup, plans=PLANS, elements=None):
    from gpras_tpu.data.builders import HmsUpskillDataBuilder

    return HmsUpskillDataBuilder(
        hf_ras=RasModel.from_stac(hms_setup["hf"]["stac"]),
        inflow_dss_dir=hms_setup["inflow"],
        inflow_hms_elements=elements or [["west-fork_s340", "FLOW"],
                                         ["west-fork_s340", "FLOW-BASE"]],
        precip_dss_dir=hms_setup["precip"],
        precip_spatial_mode_count=3,
        mesh_id=fx.MESH_ID, plans=plans,
        area_of_interest=Polygon.from_geojson_file(hms_setup["aoi"]))


def test_hms_upskill_features(hms_setup):
    b = _hms_builder(hms_setup)
    lf = b.get_lf_plan_data("e1")
    inflow_cols = [c for c in lf.columns if not str(c).startswith("precip_")]
    precip_cols = [c for c in lf.columns if str(c).startswith("precip_")]
    assert inflow_cols == ["west-fork_s340_FLOW", "west-fork_s340_FLOW-BASE"]
    assert len(precip_cols) > 10  # AOI covers most of the 8x8 grid
    assert lf.shape[0] == T_STEPS
    assert np.all(np.isfinite(lf.values))
    hf_df, lf_df = b.aligned_datasets
    assert hf_df.shape[0] == lf_df.shape[0]


def test_hms_pipeline_end_to_end(hms_setup, tmp_path):
    """hms_upskill LF model type through the full pipeline."""
    from gpras_tpu.pipeline.config import Config
    from gpras_tpu.pipeline.pipeline import pipeline

    event_plans = tmp_path / "ep.json"
    fx.write_event_plans(event_plans, train=["e1", "e3"], test=["e2"])
    config = Config(
        working_directory=str(tmp_path / "work"),
        hf_ras_stac_path=str(hms_setup["hf"]["stac"]),
        area_of_interest_path=str(hms_setup["aoi"]),
        event_plan_path=str(event_plans),
        mesh_id=fx.MESH_ID,
        hydraulic_parameter="wse",
        wet_threshold_depth=0.05,
        spatial_mode_count=2,
        kernel="RBF",
        inducing_pt_count=10,
        optimizer="adam",
        induction_pt_initializer="kmeans",
        optimizer_kwargs={"max_iter": 40},
        generate_plots=False,
        save_dbs=False,
        lf_model_type="hms_upskill",
        inflow_dss_dir=hms_setup["inflow"],
        inflow_hms_elements=[["west-fork_s340", "FLOW"]],
        precip_dss_dir=hms_setup["precip"],
        precip_spatial_mode_count=2,
        dtype="float64",
    )
    summary = pipeline(config)
    assert np.isfinite(summary["depth_rmse"])
    assert (tmp_path / "work" / "model" / "lf_preprocessor.npz").exists()
    assert (tmp_path / "work" / "model" / "hf_preprocessor.npz").exists()


def test_pseudo_surface_builder(hms_setup, tmp_path):
    """Train a tiny fluvial HMS model, then compose the pseudo-surface builder
    (rating curves + centerline + nested GPR floor)."""
    import json

    from gpras_tpu.data.builders import PseudoSurfaceDataBuilder
    from gpras_tpu.eof.preprocessor import HmsPreProcessor, PreProcessor
    from gpras_tpu.gp.model import GPRAS
    import jax.numpy as jnp

    hf_model = RasModel.from_stac(hms_setup["hf"]["stac"])
    # 1. fluvial HMS-upskill artifacts (same element list the pseudo builder uses)
    hb = _hms_builder(hms_setup, elements=[["west-fork_s340", "FLOW"]])
    hf_df, lf_df = hb.aligned_datasets
    hf_pre = PreProcessor(wet_threshold=0.05, hydraulic_parameter="wse")
    hf_pre.fit(hf_df.values, hb.cell_elevations, hb.cell_areas, 2)
    precip_mask = np.array([str(c).startswith("precip_") for c in lf_df.columns])
    lf_pre = HmsPreProcessor()
    lf_pre.fit(lf_df.values, ~precip_mask, precip_mask, 2)
    gpr = GPRAS("RBF", dtype=jnp.float64)
    gpr.fit(lf_pre.transform(lf_df.values), hf_pre.transform(hf_df.values),
            n_inducing=8, optimization_method="adam", max_iter=30)
    art = tmp_path / "fluvial"
    art.mkdir()
    hf_pre.to_file(art / "hf_pre.npz")
    lf_pre.to_file(art / "lf_pre.npz")
    gpr.to_file(art / "gpr.npz")
    # 2. centerline crossing the grid horizontally
    centerline = tmp_path / "centerline.geojson"
    centerline.write_text(json.dumps({
        "type": "Feature",
        "geometry": {"type": "LineString",
                     "coordinates": [[0.1, 3.0], [5.9, 3.0]]}}))
    # 3. compose
    b = PseudoSurfaceDataBuilder(
        hf_ras=hf_model,
        inflow_dss_dir=hms_setup["inflow"],
        inflow_hms_elements=[["west-fork_s340", "FLOW"]],
        precip_dss_dir=hms_setup["precip"],
        precip_spatial_mode_count=2,
        fluvial_lf_preprocessor_path=str(art / "lf_pre.npz"),
        fluvial_hf_preprocessor_path=str(art / "hf_pre.npz"),
        fluvial_gpr_path=str(art / "gpr.npz"),
        us_bc_id_ras="inflow", ds_bc_id_ras="outflow",
        us_bc_id_hms="west-fork_s340", ds_bc_id_hms="outlet_hms",
        centerline_path=str(centerline),
        mesh_id=fx.MESH_ID, plans=PLANS,
        area_of_interest=Polygon.from_geojson_file(hms_setup["aoi"]))
    assert len(b.centerline_cell_ids) >= 4  # the line crosses >= 4 cells
    assert b.us_rating_curve.fit_stats["rmse"] < 1.0
    lf = b.get_lf_plan_data("e1")
    assert lf.shape == (T_STEPS, len(b.hf_cell_ids_aoi))
    assert np.all(np.isfinite(lf.values))
    assert np.all(lf.values >= b.cell_elevations[None, :] - 1e-5)
    # stations increase along the centerline cells
    stations = b.cell_stations
    assert np.all(np.diff(np.sort(stations)) >= 0)
    assert stations.max() <= b.centerline.length + 1e-6


def test_event_ids_raises_without_run_level():
    """api_event_reset=True must refuse frames without event boundaries
    instead of silently convolving across events."""
    import pandas as pd
    import pytest

    from gpras_tpu.pipeline.pipeline import _event_ids

    class _Cfg:
        api_event_reset = True

    df = pd.DataFrame(np.ones((4, 2)))  # plain RangeIndex
    with pytest.raises(ValueError, match="run"):
        _event_ids(df, _Cfg())
    # with the flag off: always None, no validation
    _Cfg.api_event_reset = False
    assert _event_ids(df, _Cfg()) is None
