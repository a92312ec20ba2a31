"""Host data layer: flow/plan files, rating curve, geometry, RasModel, builders."""

import os
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from gpras_tpu.data.flow_file import (
    FlowHydrographBC,
    NormalDepthBC,
    UnsteadyFlowFile,
)
from gpras_tpu.data.geometry import CellMesh, LineString, Polygon, rasterize_polygon
from gpras_tpu.data.plan_file import PlanFile, update_hdf_attributes, update_hdf_data
from gpras_tpu.data.rating_curve import RatingCurve, bspline_design_matrix
from gpras_tpu.data.ras_model import RasModel

import fixtures as fx

BRIDGEPORT_U01 = "/root/reference/data/run_creation/bridgeport.u01"


# ---------------------------------------------------------------------------- flow files

def test_flow_file_parse_emit_fixpoint_synthetic():
    f = UnsteadyFlowFile("test storm", file_description="a synthetic event")
    f.initial_conditions.consume("IC Point Elev=ic_a                      ,840.7")
    f.boundary_conditions.bcs.append(NormalDepthBC(
        "0.004", "0", sa_2d_id=" " * 16, mesh_name="mesh1".ljust(16),
        bc_line_id="bc_out".ljust(32)))
    f.boundary_conditions.bcs.append(FlowHydrographBC(
        interval="1HOUR", dss_file="flows.dss", dss_path="//A/FLOW//1HOUR/RUN:X/",
        sa_2d_id=" " * 16, mesh_name="mesh1".ljust(16),
        bc_line_id="bc_in".ljust(32)))
    text = f.emit()
    g = UnsteadyFlowFile.from_string(text)
    assert g.flow_title == "test storm"
    assert len(g.initial_conditions.ics) == 1
    assert g.initial_conditions.ics[0].elevation == "840.7"
    assert len(g.boundary_conditions.bcs) == 2
    kinds = {type(bc) for bc in g.boundary_conditions.bcs}
    assert kinds == {NormalDepthBC, FlowHydrographBC}
    # emit -> parse -> emit is a fixpoint
    assert UnsteadyFlowFile.from_string(g.emit()).emit() == g.emit()


CEDAR_U01 = str(Path(__file__).parent / "data" / "cedar_basin.u01")


def test_flow_file_golden_cedar_basin():
    """Golden round-trip on the OWNED committed fixture (a realistic
    HEC-RAS 6.x unsteady-flow file, tests/data/make_flow_fixture.py) — the
    strongest parser test no longer depends on an external checkout being
    mounted. Parse -> emit reproduces the committed bytes EXACTLY."""
    raw = Path(CEDAR_U01).read_bytes()
    f = UnsteadyFlowFile.from_file(CEDAR_U01)
    assert f.flow_title == "jun2003"
    assert f.program_version == "6.50"
    assert "Cedar Mill Pond" in f.file_description
    assert len(f.initial_conditions.ics) == 4
    assert all(ic.ic_type == "IC Point" for ic in f.initial_conditions.ics)
    assert f.initial_conditions.ics[1].elevation == "538.2"
    bcs = f.boundary_conditions.bcs
    hydro = [b for b in bcs if isinstance(b, FlowHydrographBC)]
    normal = [b for b in bcs if isinstance(b, NormalDepthBC)]
    assert len(normal) == 1 and len(hydro) == 6
    assert normal[0].friction_slope == "0.0035"
    assert all("FLOW" in b.dss_path for b in hydro)
    assert f.precip_mode == "Enable"
    assert f.precipitation.get("Mode") == "Gridded"
    assert "Excess_Precipitation.dss" in \
        (f.precipitation.get("Gridded DSS Filename") or "")
    observed = "\n".join(f.observed_time_series)
    assert "Observed Time Series=Stage|TS DSS Pathname=" in observed
    assert "Observed Time Series=Flow|TS Table Data Units=cfs" in observed
    # parse -> emit is BYTE-IDENTICAL to the committed fixture (ASCII+CRLF)
    assert f.emit().replace("\n", "\r\n").encode("ascii") == raw


@pytest.mark.skipif(not os.path.exists(BRIDGEPORT_U01),
                    reason="reference data not mounted")
def test_flow_file_parses_real_bridgeport():
    f = UnsteadyFlowFile.from_file(BRIDGEPORT_U01)
    assert f.flow_title == "may1990"
    assert len(f.initial_conditions.ics) == 6
    assert all(ic.ic_type == "IC Point" for ic in f.initial_conditions.ics)
    bcs = f.boundary_conditions.bcs
    assert len(bcs) > 5
    hydro = [b for b in bcs if isinstance(b, FlowHydrographBC)]
    normal = [b for b in bcs if isinstance(b, NormalDepthBC)]
    assert len(normal) >= 1 and len(hydro) >= 4
    assert all("FLOW" in b.dss_path for b in hydro)
    # round trip: emitted file re-parses to the same structure
    g = UnsteadyFlowFile.from_string(f.emit())
    assert len(g.boundary_conditions.bcs) == len(bcs)
    assert [b.bc_line_id for b in g.boundary_conditions.bcs] == \
           [b.bc_line_id for b in bcs]
    assert UnsteadyFlowFile.from_string(g.emit()).emit() == g.emit()


def test_flow_file_crlf_ascii_output(tmp_path):
    f = UnsteadyFlowFile("t")
    p = tmp_path / "t.u01"
    f.to_file(str(p))
    raw = p.read_bytes()
    assert b"\r\n" in raw
    raw.decode("ascii")  # must not raise


# ---------------------------------------------------------------------------- plan files

def test_plan_file_overrides_and_roundtrip(tmp_path):
    pf = PlanFile({"Plan Title": "event_42", "Simulation Date": "01JAN2020,0000,02JAN2020,0000"})
    p = tmp_path / "m.p02"
    pf.to_file(p)
    back = PlanFile.from_file(p)
    assert back.settings["Plan Title"] == "event_42"
    assert back.settings["Simulation Date"] == "01JAN2020,0000,02JAN2020,0000"
    raw = p.read_bytes()
    assert b"\r\n" in raw


def test_update_hdf_attributes_and_data(tmp_path):
    import h5py

    path = tmp_path / "x.hdf"
    with h5py.File(path, "w") as f:
        g = f.create_group("Plan Data/Plan Information")
        g.attrs["Plan Name"] = np.bytes_(b"old")
        f.create_dataset("Event Conditions/Meteorology/Precipitation/Values",
                         data=np.zeros((3, 4)))
    update_hdf_attributes(str(path), "Plan Data/Plan Information",
                          {"Plan Name": "new", "Count": 3})
    update_hdf_data(str(path), "Event Conditions/Meteorology/Precipitation/Values",
                    np.ones((5, 2), dtype=np.float32))
    with h5py.File(path) as f:
        assert f["Plan Data/Plan Information"].attrs["Plan Name"] == b"new"
        assert f["Plan Data/Plan Information"].attrs["Count"] == 3
        assert f["Event Conditions/Meteorology/Precipitation/Values"].shape == (5, 2)


# -------------------------------------------------------------------------- rating curve

def test_bspline_design_matrix_partition_of_unity():
    x = np.linspace(0, 10, 200)
    knots = np.concatenate([[0] * 4, [2.5, 5, 7.5], [10] * 4])
    b = bspline_design_matrix(x, knots, 3)
    np.testing.assert_allclose(b.sum(axis=1), 1.0, atol=1e-12)
    assert np.all(b >= -1e-12)


def test_rating_curve_fits_smooth_relation():
    rng = np.random.default_rng(0)
    q = np.exp(rng.uniform(np.log(20), np.log(5000), 300))
    wse = 100 + 3 * np.log(q) + 0.05 * rng.normal(size=q.shape)
    rc = RatingCurve(q, wse)
    stats = rc.fit_stats
    assert stats["rmse"] < 0.1, stats
    pred = rc.predict(np.array([50.0, 500.0, 4000.0]))
    want = 100 + 3 * np.log(np.array([50.0, 500.0, 4000.0]))
    np.testing.assert_allclose(pred, want, atol=0.2)


def test_rating_curve_filters_and_sorts():
    q = np.array([np.nan, -5, 5, 100, 200, 50, 400, 300, 800, 600, 1000, 900,
                  1500, 1200, 2000])
    wse = 10 + np.sqrt(np.abs(q))
    rc = RatingCurve(q, wse, n_knots=3)
    assert np.all(np.isfinite(rc.q))
    assert np.all(rc.q > 10)
    assert np.all(np.diff(rc.q) >= 0)


def test_rating_curve_too_few_points_raises():
    with pytest.raises(ValueError):
        RatingCurve(np.arange(5) + 20.0, np.arange(5.0))


# ------------------------------------------------------------------------------ geometry

def test_polygon_contains_and_area():
    sq = Polygon(np.array([[0, 0], [2, 0], [2, 2], [0, 2]]))
    assert sq.area == 4.0
    np.testing.assert_allclose(sq.centroid, [1, 1])
    inside = sq.contains_points(np.array([[1, 1], [3, 1], [1.9, 1.9]]))
    assert inside.tolist() == [True, False, True]


def test_cellmesh_areas_centroids_intersects():
    pts, fpi = fx.grid_mesh(4, 3, 1.0)
    mesh = CellMesh(np.arange(12), fpi, pts)
    np.testing.assert_allclose(mesh.areas, 1.0)
    np.testing.assert_allclose(mesh.centroids, fx.cell_centroids(4, 3, 1.0))
    aoi = Polygon(np.array([[0.6, 0.6], [2.4, 0.6], [2.4, 1.4], [0.6, 1.4]]))
    mask = mesh.intersects(aoi)
    assert mask.sum() >= 3  # cells (0,0)..(2,0) at least touch via vertices
    assert not mask[-1]


def test_linestring_project_and_sample():
    line = LineString(np.array([[0, 0], [10, 0]]))
    assert line.length == 10.0
    assert line.project(np.array([3.0, 5.0])) == 3.0
    s = line.sample(2.5)
    assert len(s) >= 5
    np.testing.assert_allclose(s[0], [0, 0])
    np.testing.assert_allclose(s[-1], [10, 0])


def test_rasterize_polygon():
    poly = Polygon(np.array([[1, 1], [3, 1], [3, 3], [1, 3]]))
    mask = rasterize_polygon(poly, (0.0, 4.0), 1.0, (4, 4), all_touched=False)
    # grid rows top-down: y centers 3.5,2.5,1.5,0.5; x centers 0.5..3.5
    want = np.array([
        [0, 0, 0, 0],
        [0, 1, 1, 0],
        [0, 1, 1, 0],
        [0, 0, 0, 0],
    ], dtype=bool)
    np.testing.assert_array_equal(mask, want)


# ------------------------------------------------------------------------------ RasModel

@pytest.fixture(scope="module")
def hf_project(tmp_path_factory):
    root = tmp_path_factory.mktemp("hf_proj")
    return fx.make_project(root, "hfm", nx=6, ny=6, cell=1.0,
                           plans=["e1", "e2", "e3"])


def test_ras_model_reads_synthetic_project(hf_project):
    model = RasModel.from_stac(hf_project["stac"])
    assert set(model.plan_hdfs) == {"e1", "e2", "e3"}
    elev = model.get_cell_minimum_elevation("e1", fx.MESH_ID)
    np.testing.assert_allclose(elev, hf_project["elevations"])
    areas = model.get_cell_areas("e1", fx.MESH_ID)
    np.testing.assert_allclose(areas, hf_project["areas"])
    wse = model.get_plan_wsels(["e1", "e2"], fx.MESH_ID)
    assert wse.index.names == ["run", "t"]
    assert wse.shape == (80, 36)
    depths = model.get_plan_depths(["e1"], fx.MESH_ID)
    assert (depths.values >= -1e-5).all()
    mesh = model.get_plan_geometry(["e1", "e2"], fx.MESH_ID)
    assert mesh.n_cells == 36
    np.testing.assert_allclose(mesh.centroids, hf_project["centroids"])


def test_ras_model_prj_mutation(tmp_path):
    proj = fx.make_project(tmp_path / "m", "mm", nx=2, ny=2, cell=1.0, plans=["a"])
    model = RasModel.from_stac(proj["stac"])
    pf = PlanFile({"Plan Title": "added"})
    new_path = model.add_text_file(pf)
    assert new_path.endswith(".p01")
    assert "Plan File=p01" in (tmp_path / "m" / "mm.prj").read_text()
    # next suffix increments
    pf2 = PlanFile({"Plan Title": "added2"})
    new_path2 = model.add_text_file(pf2)
    assert new_path2.endswith(".p02")


def test_flow_file_met_attrs_and_ic_names_roundtrip(tmp_path):
    """Regression: met 'Met BC=<param>|<attr>=<value>' lines must survive the
    parse (the dispatch key spans two '='), IC names keep interior spaces,
    and inline flow-hydrograph slope values are preserved."""
    from gpras_tpu.data.flow_file import (FlowHydrographBC, InitialCondition,
                                          UnsteadyFlowFile, precipitation)

    f = UnsteadyFlowFile("test")
    f.precipitation = precipitation(mode="Gridded", dss_filename="rain.dss",
                                    dss_pathname="/A/B/PRECIP///1HOUR/RUN/")
    f.initial_conditions.ics.append(
        InitialCondition("Perimeter 1", "840.7", "2D"))
    bc = FlowHydrographBC(interval="1HOUR", dss_file="flows.dss",
                          dss_path="/X/Y/FLOW//1HOUR/RUN/",
                          sa_2d_id="Perimeter 1", mesh_name="mesh",
                          bc_line_id="Inflow")
    bc.flow_hydrograph_slope = "0.0003"
    f.boundary_conditions.bcs.append(bc)

    text = f.emit()
    g = UnsteadyFlowFile.from_string(text)
    assert g.precipitation.get("Mode") == "Gridded"
    assert g.precipitation.get("Gridded DSS Filename") == "rain.dss"
    assert g.initial_conditions.ics[0].idx == "Perimeter 1"
    assert g.boundary_conditions.bcs[0].flow_hydrograph_slope == "0.0003"
    # emission is a fixpoint
    assert g.emit() == text


def test_ghost_cells_trimmed_from_wsels_and_depths(tmp_path):
    """Real HEC-RAS meshes append ghost cells (NaN minimum elevation) after
    the real cells; WSE frames must trim them so depths align with the
    NaN-filtered elevations (the reference gets this from rashdf)."""
    import h5py
    from gpras_tpu.data.ras_model import RasModel

    root = tmp_path / "gm"
    root.mkdir()
    (root / "gm.prj").write_text("Proj Title=gm\n")
    n_real, n_ghost, t = 6, 3, 4
    with h5py.File(root / "gm.p01.hdf", "w") as f:
        f.attrs["Plan Name"] = b"e1"
        pi = f.create_group("Plan Data/Plan Information")
        pi.attrs["Plan Name"] = b"e1"
        pi.attrs["Geometry Title"] = b"g1"
        mesh = "Geometry/2D Flow Areas/mesh1"
        elev = np.concatenate([np.linspace(1, 2, n_real), [np.nan] * n_ghost])
        f.create_dataset(f"{mesh}/Cells Minimum Elevation", data=elev)
        wse = np.tile(np.linspace(3, 4, n_real + n_ghost), (t, 1))
        f.create_dataset(
            "Results/Unsteady/Output/Output Blocks/Base Output/"
            "Unsteady Time Series/2D Flow Areas/mesh1/Water Surface", data=wse)
        stamps = [f"01JAN2020 0{h}:00:00".encode() for h in range(t)]
        f.create_dataset(
            "Results/Unsteady/Output/Output Blocks/Base Output/"
            "Unsteady Time Series/Time Date Stamp", data=np.array(stamps))
    m = RasModel(root / "gm.prj")
    wsels = m.get_plan_wsels(["e1"], "mesh1")
    assert wsels.shape == (t, n_real)
    depths = m.get_plan_depths(["e1"], "mesh1")
    assert depths.shape == (t, n_real)
    assert np.all(np.isfinite(depths.values))


def test_plan_template_golden_capture(tmp_path):
    """Golden pinning of the captured HEC-RAS 6.50 plan template (reference
    gpras/ras/static/plan_template.txt via gpras/ras/plan.py:84-124): every
    key HEC-RAS writes is present, in order, with HEC-RAS's own value
    spacing; bare flag lines and the duplicated key survive a byte-exact
    file round trip."""
    from gpras_tpu.data.plan_template import PLAN_TEMPLATE_650

    pf = PlanFile()
    # full capture: 217 entries, 4 bare flags, one legitimately repeated key
    assert len(pf.entries) == len(PLAN_TEMPLATE_650) == 217
    flags = [k for k, v in pf.entries if v is None]
    assert flags == ["Subcritical Flow", "Parabolic Critical Depth",
                     "WQ AD Non Conservative", "Transport Output Increment 1"]
    assert sum(1 for k, _ in pf.entries if k == "UNET D2 Cores") == 2
    # HEC-RAS's own value spacing is preserved verbatim (fixed-width ints)
    s = pf.emit()
    for line in ("Program Version=6.50", "Std Step Tol= 0.01",
                 "Run UNet=-1", "UNET Theta= 1", "UNET Gravity=32.17405",
                 "Friction Slope Method= 1", "UNET D2 Eddy Viscosity=0.3",
                 "PS Max Iterations= 20", "Number of Layers= 5"):
        assert f"\n{line}\n" in f"\n{s}", line
    # ordering: simulation header before solver block before sediment block
    keys = [k for k, _ in pf.entries]
    assert keys.index("Simulation Date") < keys.index("UNET Theta") \
        < keys.index("Initial Layer Thickness")
    # byte-exact round trip through a .pXX file (CRLF on disk)
    p = tmp_path / "golden.p01"
    pf.to_file(p)
    assert PlanFile.from_file(p).emit() == s
    pf.to_file(tmp_path / "again.p01")
    assert (tmp_path / "again.p01").read_bytes() == p.read_bytes()
    # per-run overrides only change their own lines
    pf2 = PlanFile({"Plan Title": "evt", "Computation Interval": "10SEC"})
    assert pf2.settings["Plan Title"] == "evt"
    diff = [i for i, (a, b) in enumerate(zip(pf.entries, pf2.entries))
            if a != b]
    assert len(diff) == 2


def test_flow_file_observed_time_series_roundtrip():
    """The 'Observed Time Series=' calibration group (which the reference's
    trigger parser drops, gpras/ras/flow.py:512-658) is captured verbatim —
    continuation rows and Observed DSS keys included — and survives
    parse -> emit -> parse unchanged."""
    from gpras_tpu.data.flow_file import (FlowHydrographBC, InitialCondition,
                                          InitialConditions,
                                          UnsteadyFlowFile)

    f = UnsteadyFlowFile("obs_test")
    f.initial_conditions = InitialConditions(
        [InitialCondition("wet area", "0.5", "2D")])
    f.boundary_conditions.bcs.append(FlowHydrographBC(
        interval="1HOUR", dss_file="ev.dss", dss_path="/A/B/FLOW//1HOUR/RUN/",
        sa_2d_id="wet area", mesh_name="", bc_line_id="inflow"))
    observed = ("Observed Time Series=Gage 1\n"
                "Observed DSS File=obs.dss\n"
                "Observed DSS Path=/BASIN/GAGE1/STAGE//15MIN/OBS/\n"
                "     100.5     101.2     102.9")
    f.observed_time_series.append(observed)

    text = f.emit()
    g = UnsteadyFlowFile.from_string(text)
    assert g.observed_time_series == [observed]
    # byte-stable fixpoint, and the group sits between BCs and met data
    assert g.emit() == text
    assert text.index("Boundary Location=") < text.index(
        "Observed Time Series=") < text.index("Precipitation Mode=")


def test_export_rasterized_aoi_qc_dump(tmp_path):
    """The QC escape hatch for the rasterized AOI (reference
    gpras/preprocess.py:253-289 debug GeoTIFFs): npz with full
    georeferencing + a rendered PNG, reimportable and matching the mask."""
    import tests.fixtures as fx
    from gpras_tpu.data.builders import DataBuilder
    from gpras_tpu.data.geometry import Polygon

    plans = ["e1"]
    rows, cols = 6, 5
    meta = {"Raster Cellsize": 1.0, "Raster Left": 0.0, "Raster Top": 6.0,
            "Raster Rows": rows, "Raster Cols": cols}
    precip = np.abs(np.random.default_rng(0).normal(
        size=(4, rows * cols))).astype(np.float32)
    proj = fx.make_project(tmp_path / "hf", "hfm", nx=4, ny=4, cell=1.0,
                           plans=plans, precip=precip, precip_meta=meta)
    model = RasModel.from_stac(proj["stac"])
    aoi = Polygon(np.array([[0.5, 0.5], [3.5, 0.5], [3.5, 3.5], [0.5, 3.5]]))
    b = DataBuilder(hf_ras=model, mesh_id=fx.MESH_ID, plans=plans,
                    area_of_interest=aoi)
    paths = b.export_rasterized_aoi(str(tmp_path / "aoi_qc"))
    assert str(tmp_path / "aoi_qc.npz") in paths
    back = np.load(tmp_path / "aoi_qc.npz")
    np.testing.assert_array_equal(back["data"].astype(bool),
                                  b._rasterized_aoi)
    np.testing.assert_allclose(back["upper_left"], [0.0, 6.0])
    assert float(back["pixel_size"]) == 1.0
    if len(paths) > 1:  # matplotlib present in this environment
        assert (tmp_path / "aoi_qc.png").stat().st_size > 0
    # one precip timestep through the same georeferencing
    paths2 = b.export_precip_qc(precip[0].reshape(rows, cols),
                                str(tmp_path / "precip_qc"))
    back2 = np.load(tmp_path / "precip_qc.npz")
    np.testing.assert_allclose(back2["data"],
                               precip[0].reshape(rows, cols), rtol=1e-6)


def test_flow_file_fuzz_roundtrip(tmp_path):
    """Randomized emit -> parse -> emit fixpoint over the whole component
    space (ICs of both types, mixed BC lists, met attrs, wind modes,
    observed-time-series blocks, multi-line descriptions) plus CRLF/ASCII
    file round trips. The parser segments on line-prefix triggers
    (reference gpras/ras/flow.py:631-658), so values here avoid strings
    that would START a line with a registered trigger — anything else,
    including interior spaces, '=', commas in IC names, and DSS path
    slashes, must survive byte-identically."""
    from gpras_tpu.data.flow_file import InitialCondition

    rng = np.random.default_rng(20260818)
    # charset excludes ',' (BC headers split on it) except where noted
    safe = list("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
                "0123456789 -_./=")

    def rand_text(lo=1, hi=18, extra=""):
        chars = safe + list(extra)
        n = int(rng.integers(lo, hi))
        # interior spaces only: padding is the emitter's job
        return "".join(rng.choice(chars) for _ in range(n)).strip() or "x"

    for trial in range(40):
        f = UnsteadyFlowFile(
            flow_title=rand_text(1, 30),
            program_version=rng.choice(["6.6", "6.3.1", rand_text(3, 6)]),
            file_description="\n".join(
                "desc " + rand_text() for _ in range(int(rng.integers(0, 3)))),
        )
        f.initial_conditions.use_restart = str(rng.choice(["0", "1"]))
        for _ in range(int(rng.integers(0, 5))):
            f.initial_conditions.ics.append(InitialCondition(
                rand_text(extra=","),           # names may contain commas
                f"{rng.uniform(500, 900):.2f}",  # elevations may not
                str(rng.choice(["2D", "IC Point"]))))
        for _ in range(int(rng.integers(0, 4))):
            header = dict(sa_2d_id=rand_text(1, 14), mesh_name=rand_text(1, 14),
                          bc_line_id=rand_text(1, 30))
            if rng.random() < 0.5:
                f.boundary_conditions.bcs.append(
                    NormalDepthBC(f"{rng.uniform(1e-4, 0.01):.4f}", "0", **header))
            else:
                bc = FlowHydrographBC(
                    interval=str(rng.choice(["1HOUR", "15MIN", "1DAY"])),
                    dss_file=rand_text(4, 20) + ".dss",
                    dss_path=f"//{rand_text(2, 8)}/FLOW//1HOUR/RUN:{rand_text(2, 8)}/",
                    **header)
                if rng.random() < 0.5:
                    bc.flow_hydrograph = f" {int(rng.integers(0, 9))} "
                f.boundary_conditions.bcs.append(bc)
        f.precip_mode = str(rng.choice(["Disable", "Enable", "Gridded"]))
        f.wind.mode = str(rng.choice(["No Wind Forces", "Speed/Direction"]))
        if rng.random() < 0.5:
            f.precipitation.set("Mode", "Gridded")
            f.precipitation.set("Gridded DSS Filename", rand_text(4, 20) + ".dss")
            f.precipitation.set("Gridded DSS Pathname",
                                f"//{rand_text(2, 8)}/PRECIP////")
        for _ in range(int(rng.integers(0, 3))):
            f.observed_time_series.append(
                f"Observed Time Series={rand_text()}\n"
                f"  gage {rand_text()}\n  value {rng.uniform(0, 10):.3f}")

        e1 = f.emit()
        g = UnsteadyFlowFile.from_string(e1)
        e2 = g.emit()
        assert e2 == e1, f"trial {trial}: emit->parse->emit not a fixpoint"
        # semantic spot checks survive the round trip
        assert len(g.initial_conditions.ics) == len(f.initial_conditions.ics)
        assert len(g.boundary_conditions.bcs) == len(f.boundary_conditions.bcs)
        assert len(g.observed_time_series) == len(f.observed_time_series)
        assert g.precip_mode == f.precip_mode and g.wind.mode == f.wind.mode

        # file round trip: ASCII bytes, every line CRLF-terminated
        p = tmp_path / f"fuzz_{trial}.u01"
        f.to_file(str(p))
        raw = p.read_bytes()
        raw.decode("ascii")
        assert all(ln.endswith(b"\r") for ln in raw.split(b"\n") if ln)
        assert UnsteadyFlowFile.from_file(str(p)).emit() == e1
