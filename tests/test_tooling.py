"""Production tooling: event selection, run maker (FakeDss), plotting, CV."""

import json
import sqlite3
from datetime import datetime, timedelta
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

import fixtures as fx


# ------------------------------------------------------------- event selection

def make_sst_parquet(path: Path, n_events: int = 60, t_steps: int = 48,
                     seed: int = 0) -> None:
    rng = np.random.default_rng(seed)
    rows = []
    base = datetime(2020, 1, 1)
    for e in range(n_events):
        scale = np.exp(rng.normal(0.0, 1.0))
        h = fx.hydrograph(t_steps, peak=scale * 100)
        precip = np.cumsum(np.abs(rng.normal(scale, 0.3, size=t_steps)))
        for t in range(t_steps):
            rows.append({"event_id": e, "datetime": base + timedelta(hours=t),
                         "precip-cum": precip[t], "precip-excess": h[t] / 50,
                         "inflow": h[t]})
    pd.DataFrame(rows).to_parquet(path)


def test_block_maxima_return_periods_monotone():
    from gpras_tpu.pipeline.event_selection import block_maxima_return_periods

    rng = np.random.default_rng(0)
    v = rng.exponential(size=200)
    rp = block_maxima_return_periods(v, arrival_rate=10)
    order = np.argsort(v)
    assert np.all(np.diff(rp[order]) >= -1e-9)  # larger value -> larger RP
    assert rp.max() > rp.min()


def test_event_selection_end_to_end(tmp_path):
    from gpras_tpu.pipeline.event_selection import EventSelection, write_events_stac

    pq = tmp_path / "sst.pq"
    make_sst_parquet(pq)
    sel = EventSelection(str(pq), arrival_rate=5, test_rp_range=[1.2, 50])
    storms, event_max = sel.run_selection(
        n_train_storms=20, n_test_storms=6,
        target_rps=[2, 5, 10, 25])
    assert (storms["Type"] == "Train").sum() == 20
    assert (storms["Type"] == "Test").sum() == 6
    # no overlap between train and test
    train_ids = set(storms[storms["Type"] == "Train"].event_id)
    test_ids = set(storms[storms["Type"] == "Test"].event_id)
    assert not train_ids & test_ids
    assert {"Max", "AEP", "Diverse"} <= set(storms["Set"])
    stac = write_events_stac(storms, "s3://bucket/events", tmp_path / "events.stac.json")
    assert stac["properties"]["train_event_count"] == 20
    assert stac["properties"]["test_event_count"] == 6
    assert len(stac["assets"]) == 26


# ------------------------------------------------------------------- run maker

def test_run_maker_end_to_end(tmp_path):
    from gpras_tpu.data.dss import FakeDss, FakeRecord, set_dss_factory
    from gpras_tpu.pipeline import run_maker as rm
    from gpras_tpu.data.flow_file import UnsteadyFlowFile

    set_dss_factory(FakeDss)
    try:
        proj = fx.make_project(tmp_path / "model", "mm", nx=2, ny=2, cell=1.0,
                               plans=["base"])
        # template flow file with one hydrograph BC + one normal-depth BC
        from gpras_tpu.data.flow_file import FlowHydrographBC, NormalDepthBC

        tpl = UnsteadyFlowFile("template")
        tpl.boundary_conditions.bcs.append(FlowHydrographBC(
            interval="1HOUR", dss_file="x.dss", dss_path="//OLD/FLOW-BASE/OLD//",
            sa_2d_id=" " * 16, mesh_name="mesh1".ljust(16),
            bc_line_id="bc_west-fork_s340_base".ljust(32)))
        tpl.boundary_conditions.bcs.append(NormalDepthBC(
            "0.004", "0", sa_2d_id=" " * 16, mesh_name="mesh1".ljust(16),
            bc_line_id="bc_out".ljust(32)))
        tpl_path = tmp_path / "template.u99"
        tpl.to_file(str(tpl_path))

        # fake SST dss with the matching element
        times = [datetime(2020, 1, 1) + timedelta(hours=h) for h in range(100)]
        src_dss = tmp_path / "SST.dss"
        src_dss.write_bytes(b"fake")
        flow_dss_abs = tmp_path / "model" / "gpr_dss_files" / "flow_boundaries" / "ev1.dss"
        FakeDss.register(str(flow_dss_abs), {
            "/TRINITY/west-fork_s340/FLOW-BASE/WRONGDATES/1HOUR/RUN:X/":
                FakeRecord(values=np.linspace(0, 50, 100), times=times),
        })

        settings = rm.Settings(
            ras_prj_path=str(tmp_path / "model" / "mm.prj"),
            template_flow_path=str(tpl_path),
            flow_dss_path_src=str(src_dss),
            precip_hdf_path="",  # skip precip for this test
            flow_title="ev1", plan_title="ev1", plan_short_id="ev1")
        rm.add_run(settings)

        # flow file written + registered
        assert settings.flow_file_path.endswith(".u01")
        flow = UnsteadyFlowFile.from_file(settings.flow_file_path)
        hyd = [b for b in flow.boundary_conditions.bcs
               if isinstance(b, FlowHydrographBC)]
        assert hyd[0].dss_file == "./gpr_dss_files/flow_boundaries/ev1.dss"
        # the D part was rewritten to the event window
        assert "01JAN2020-05JAN2020" in hyd[0].dss_path
        # plan file with simulation dates + flow suffix
        from gpras_tpu.data.plan_file import PlanFile

        plan = PlanFile.from_file(settings.plan_file_path)
        assert plan.settings["Flow File"] == "u01"
        assert plan.settings["Simulation Date"].startswith("01JAN2020")
        prj_text = (tmp_path / "model" / "mm.prj").read_text()
        assert "Unsteady File=u01" in prj_text
        assert "Plan File=p01" in prj_text
    finally:
        set_dss_factory(None)


def test_clean_ffrd_bc():
    from gpras_tpu.pipeline.run_maker import clean_ffrd_bc

    assert clean_ffrd_bc(" bc_west-fork_s340_base ") == "west-fork_s340"
    assert clean_ffrd_bc("bc_x") == "x"
    assert clean_ffrd_bc("plain") == "plain"


# -------------------------------------------------------------------- plotting

def test_plotting_suite_smoke(tmp_path):
    import gpras_tpu.plotting as pl

    rng = np.random.default_rng(0)
    x = rng.normal(size=(50, 4))
    y = x + 0.1 * rng.normal(size=(50, 4))
    pl.ec_pairplot(x, y, 3, tmp_path / "pair.png", inducing=rng.normal(size=(5, 4)))
    assert (tmp_path / "pair.png").exists()
    idx = pd.MultiIndex.from_product([["e1"], range(50)])
    pl.ec_timeseries(x, y, np.abs(y) * 0.1, 2, idx, tmp_path / "ects")
    assert (tmp_path / "ects" / "e1.png").exists()
    pl.pca_variance_summary(np.array([10.0, 5, 2, 1, 0.5]), 3, tmp_path / "pca.png")
    hf = rng.normal(size=(30, 20))
    pl.performance_scatterplot(hf + 0.5, hf, hf + 0.1, tmp_path / "scatter.png")
    pl.performance_cdf(hf + 0.5, hf, hf + 0.1, tmp_path / "cdf.png")
    pl.ts_clipping(np.abs(rng.normal(size=(40, 5))), (5, 35), tmp_path / "clip.png")
    pl.plot_rating_curve(np.abs(rng.normal(size=50)) * 100 + 20,
                         rng.normal(size=50) + 100,
                         np.linspace(20, 300, 100), np.linspace(99, 102, 100),
                         tmp_path / "rc.png")
    pl.plot_centerline_interpolater(np.linspace(0, 100, 10),
                                    np.linspace(0, 1, 10), tmp_path / "cl.png")
    # metric-db-driven plots
    cells = pd.DataFrame({"cell_id": range(20), "x": rng.normal(size=20),
                          "y": rng.normal(size=20)})
    db = tmp_path / "m.db"
    with sqlite3.connect(db) as con:
        pd.DataFrame({"event": ["e1"] * 20, "cell_id": range(20),
                      "rmse_cell_toi": rng.random(20),
                      "err_cell_mts": rng.normal(size=20),
                      "err_cell_toi": rng.normal(size=20)}).to_sql(
            "cell_metrics", con, index=False)
        pd.DataFrame({"event": ["e1"] * 30, "timestep": range(30),
                      "rmse_aoi_ts": rng.random(30),
                      "err_aoi_ts": rng.normal(size=30)}).to_sql(
            "timeseries_metrics", con, index=False)
        pd.DataFrame({"event": ["e1"], "nse_aoi_mts": [0.9],
                      "err_aoi_mts": [0.1], "fi_aoi_toi": [0.8]}).to_sql(
            "scalar_metrics", con, index=False)
    pl.map_mesh_errors(cells, db, tmp_path / "maps", "rmse", "rmse_cell_toi", "RMSE")
    assert (tmp_path / "maps" / "e1_rmse.png").exists()
    pl.plot_timeseries_metrics(db, tmp_path / "tsm",
                               ["rmse_aoi_ts", "err_aoi_ts"], ["RMSE", "ME"])
    assert (tmp_path / "tsm" / "e1.png").exists()
    pl.summary_plots(db, tmp_path / "sum", {
        "scalar_metrics": {"nse_aoi_mts": "NSE"},
        "timeseries_metrics": {"rmse_aoi_ts": "Temporal RMSE"}})
    assert (tmp_path / "sum" / "summary_timeseries_metrics_rmse_aoi_ts.png").exists()
    eofs = rng.normal(size=(3, 20))
    pl.plot_eof_maps(eofs, list(range(20)), cells, tmp_path / "eofs", n_modes=2)
    assert (tmp_path / "eofs" / "eof_1.png").exists()
    depth = np.abs(rng.normal(size=(30, 20)))
    idx2 = pd.MultiIndex.from_product([["e1"], range(30)])
    pl.map_detection_categories(cells, depth, depth + 0.2, idx2.values,
                                list(range(20)), tmp_path / "det",
                                wet_threshold_depth=0.5)
    assert (tmp_path / "det" / "e1_detection.png").exists()


def test_polygon_choropleth_renders_pixels(tmp_path):
    """Cell tables with a ``geometry`` column render true polygon fills
    (PolyCollection), and the saved PNG actually contains the two cell colors
    in their interiors (reference parity: geopandas .plot choropleths,
    gpras/utils/plotting.py:410-443)."""
    import matplotlib.pyplot as plt
    from matplotlib.collections import PolyCollection

    import gpras_tpu.plotting as pl

    # two unit squares side by side, extreme values -> opposite cmap ends
    left = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], dtype=float)
    right = left + [1.0, 0.0]
    cells = pd.DataFrame({"cell_id": [0, 1], "x": [0.5, 1.5], "y": [0.5, 0.5]})
    cells["geometry"] = [left, right]
    fig, ax = plt.subplots()
    art = pl._cell_fill(ax, cells, np.array([0.0, 1.0]), cmap="viridis",
                        symmetric=False)
    assert isinstance(art, PolyCollection)
    out = tmp_path / "poly.png"
    fig.savefig(out, dpi=100)
    plt.close(fig)
    img = plt.imread(out)  # (H, W, 4) floats
    h, w = img.shape[:2]
    # sample interior pixels of each cell via the axes transform
    disp = ax.transData.transform(np.array([[0.5, 0.5], [1.5, 0.5]]))
    px = [(int(h - d[1]), int(d[0])) for d in disp]  # row, col
    c_left, c_right = (img[r, c, :3] for r, c in px)
    # viridis: low = dark purple (blue-dominant), high = yellow (red+green)
    assert not np.allclose(c_left, c_right, atol=0.05)
    assert c_left[2] > c_left[0]   # purple end: blue > red
    assert c_right[0] > 0.7 and c_right[1] > 0.7 and c_right[2] < 0.4  # yellow

    # tables without geometry still render (scatter fallback)
    fig2, ax2 = plt.subplots()
    art2 = pl._cell_fill(ax2, cells.drop(columns="geometry"),
                         np.array([0.0, 1.0]))
    assert not isinstance(art2, PolyCollection)
    plt.close(fig2)


def test_detection_map_uses_polygons(tmp_path):
    """map_detection_categories renders polygon fills when geometry exists."""
    import gpras_tpu.plotting as pl

    rng = np.random.default_rng(1)
    polys = [np.array([[i, 0], [i + 1, 0], [i + 1, 1], [i, 1]], dtype=float)
             for i in range(6)]
    cells = pd.DataFrame({"cell_id": range(6),
                          "x": np.arange(6) + 0.5, "y": [0.5] * 6})
    cells["geometry"] = polys
    depth = np.abs(rng.normal(size=(10, 6)))
    idx = pd.MultiIndex.from_product([["e1"], range(10)])
    pl.map_detection_categories(cells, depth, depth + 0.3, idx.values,
                                list(range(6)), tmp_path, wet_threshold_depth=0.5)
    out = tmp_path / "e1_detection.png"
    assert out.exists() and out.stat().st_size > 5000


# ---------------------------------------------------------- cross-validation

def test_cv_config_splits_within_training_set(tmp_path):
    from gpras_tpu.pipeline.cross_validation import CVConfig

    plans = [
        {"plan_title": "a", "event_number": 1, "type": "Train", "set": "AEP"},
        {"plan_title": "b", "event_number": 2, "type": "Train", "set": "Diverse"},
        {"plan_title": "c", "event_number": 3, "type": "Test", "set": "Test"},
    ]
    ep = tmp_path / "ep.json"
    ep.write_text(json.dumps(plans))
    cfg = CVConfig(
        working_directory=str(tmp_path / "w"), hf_ras_stac_path="x",
        area_of_interest_path="x", event_plan_path=str(ep), mesh_id="m",
        hydraulic_parameter="wse", wet_threshold_depth=0.5,
        spatial_mode_count=2, kernel="RBF", inducing_pt_count=4,
        optimizer="adam", induction_pt_initializer="kmeans",
        optimizer_kwargs={}, generate_plots=False, save_dbs=False,
        lf_model_type="ras_upskill")
    assert cfg.train_plans == ["a"]
    assert cfg.test_plans == ["b"]


def test_new_plot_variants_smoke(tmp_path):
    """ec_timeseries_alt / appr_3_pairplot / map_errors / plot_spatial_eof
    render files (reference plotting.py:258-299, 410-443, 637-681 parity)."""
    import numpy as np
    import pandas as pd

    from gpras_tpu import plotting as P

    rng = np.random.default_rng(0)
    idx = pd.MultiIndex.from_tuples(
        [(e, t) for e in ("p01", "p02") for t in range(12)])
    x = rng.normal(size=(24, 3))
    y = rng.normal(size=(24, 2))
    P.ec_timeseries_alt(x, y, idx, tmp_path / "alt")
    P.appr_3_pairplot(x, y, idx, tmp_path / "a3")
    assert (tmp_path / "alt" / "Plan_p01.png").exists()
    assert (tmp_path / "a3" / "Plan_p02.png").exists()

    cells = pd.DataFrame({"cell_id": np.arange(16),
                          "x": rng.normal(size=16), "y": rng.normal(size=16)})
    P.map_errors(cells, rng.normal(size=16), "RMSE", "p01",
                 tmp_path / "err.png", colormap_limits=(-1.0, 1.0))
    assert (tmp_path / "err.png").exists()
    P.plot_spatial_eof(tmp_path, rng.normal(size=8), 0,
                       np.arange(8), cells)
    assert (tmp_path / "eof_0.png").exists()


def test_run_maker_no_matching_bc_raises(tmp_path):
    """Regression: a flow DSS whose catalog matches no template BC must raise
    instead of silently reusing the previous event's simulation window."""
    import pytest
    from gpras_tpu.data.dss import FakeDss, FakeRecord, set_dss_factory
    from gpras_tpu.data.flow_file import FlowHydrographBC, UnsteadyFlowFile
    from gpras_tpu.pipeline import run_maker as rm

    set_dss_factory(FakeDss)
    try:
        tpl = UnsteadyFlowFile("template")
        tpl.boundary_conditions.bcs.append(FlowHydrographBC(
            interval="1HOUR", dss_file="x.dss", dss_path="//OLD/FLOW-BASE///",
            sa_2d_id=" " * 16, mesh_name="m".ljust(16),
            bc_line_id="bc_other_element".ljust(32)))
        times = [datetime(2020, 1, 1) + timedelta(hours=h) for h in range(5)]
        settings = rm.Settings(
            ras_prj_path=str(tmp_path / "x.prj"), template_flow_path="t",
            flow_dss_path_src=str(tmp_path / "src.dss"), precip_hdf_path="",
            flow_title="e", plan_title="e", plan_short_id="e")
        FakeDss.register(settings.flow_dss_path_absolute, {
            "/T/unrelated/FLOW-BASE/D/1HOUR/R/":
                FakeRecord(values=np.arange(5.0), times=times),
        })
        settings.start_time = datetime(1999, 1, 1)   # stale values that must
        settings.end_time = datetime(1999, 1, 4)     # NOT survive
        with pytest.raises(RuntimeError, match="No flow-hydrograph BC"):
            rm.add_boundary_conditions_to_unsteady_flow(tpl, settings)
        assert settings.start_time is None  # stale window cleared
    finally:
        set_dss_factory(None)


def test_run_maker_wrong_c_part_raises(tmp_path):
    """A B-part match with the wrong C part names the element in the error."""
    import pytest
    from gpras_tpu.data.dss import FakeDss, FakeRecord, set_dss_factory
    from gpras_tpu.data.flow_file import FlowHydrographBC, UnsteadyFlowFile
    from gpras_tpu.pipeline import run_maker as rm

    set_dss_factory(FakeDss)
    try:
        tpl = UnsteadyFlowFile("template")
        tpl.boundary_conditions.bcs.append(FlowHydrographBC(
            interval="1HOUR", dss_file="x.dss", dss_path="//OLD/FLOW-BASE///",
            sa_2d_id=" " * 16, mesh_name="m".ljust(16),
            bc_line_id="bc_west-fork_s340_base".ljust(32)))
        times = [datetime(2020, 1, 1) + timedelta(hours=h) for h in range(5)]
        settings = rm.Settings(
            ras_prj_path=str(tmp_path / "x.prj"), template_flow_path="t",
            flow_dss_path_src=str(tmp_path / "src.dss"), precip_hdf_path="",
            flow_title="e", plan_title="e", plan_short_id="e")
        FakeDss.register(settings.flow_dss_path_absolute, {
            # right element, wrong C part
            "/T/west-fork_s340/FLOW/D/1HOUR/R/":
                FakeRecord(values=np.arange(5.0), times=times),
        })
        with pytest.raises(RuntimeError, match="west-fork_s340"):
            rm.add_boundary_conditions_to_unsteady_flow(tpl, settings)
    finally:
        set_dss_factory(None)
