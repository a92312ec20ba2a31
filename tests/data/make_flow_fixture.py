"""Regenerate the committed golden flow-file fixture ``cedar_basin.u01``.

An OWNED real-world-shaped HEC-RAS unsteady-flow fixture: synthetic project
(a fictional Cedar Creek basin storm), but structurally faithful to the files
HEC-RAS 6.x writes — multi-gage initial conditions with a free-text
description block, a normal-depth outlet, several DSS-linked flow-hydrograph
inlets, gridded excess-precipitation forcing, constant air density/pressure,
observed stage+flow gage series, and the non-Newtonian options tail — so the
strongest parser test (tests/test_data_layer.py golden round-trip) does not
depend on any external checkout being mounted. The reference ships its own
live data file for this role (bridgeport.u01); that test still runs as an
extra when the reference is present.

Run ``python tests/data/make_flow_fixture.py`` from the repo root to
regenerate; the test asserts the PARSE -> EMIT byte round-trip against the
committed bytes, so regeneration is only needed when the emitter dialect
changes intentionally.
"""

from pathlib import Path

from gpras_tpu.data.flow_file import (
    FlowHydrographBC,
    InitialCondition,
    NormalDepthBC,
    UnsteadyFlowFile,
)

DSS = r".\HMS_CedarCreek\jun-jul-2003.dss"
RUN = "RUN:JUN-JUL-2003"
WINDOW = "01JUN2003-01JUL2003"
GAGE_DSS = r"..\..\ObservedData\CedarCreek_Gages_v2.dss"


def build() -> UnsteadyFlowFile:
    f = UnsteadyFlowFile(
        "jun2003",
        program_version="6.50",
        file_description=(
            "Initial Conditions:\n"
            "CC00110 - Cedar Mill Pond - 412.8 per DSS Observed Data\n"
            "CC00245 - Granger Lake - 538.2\n"
            "CC00317 - 521\n"
            "CC00452 - Salado Weir - 474.9"
        ),
        precip_mode="Enable",
    )
    for idx, elev in [("ic_cc00110", "412.8"), ("ic_cc00245", "538.2"),
                      ("ic_cc00317", "521"), ("ic_cc00452", "474.9")]:
        f.initial_conditions.ics.append(
            InitialCondition(idx, elev, "IC Point"))
    mesh = "cedar_1".ljust(16)
    blank16 = " " * 16
    f.boundary_conditions.bcs.append(NormalDepthBC(
        "0.0035", "0", sa_2d_id=blank16, mesh_name=mesh,
        bc_line_id="bc_cedar_out_1".ljust(32)))
    for element in ("CEDAR_S120", "CEDAR_S110", "SALADO_S220"):
        for kind in ("BASE", "SURFACE"):
            f.boundary_conditions.bcs.append(FlowHydrographBC(
                interval="1HOUR", dss_file=DSS,
                dss_path=f"//{element}/FLOW-{kind}/{WINDOW}/1HOUR/{RUN}/",
                sa_2d_id=blank16, mesh_name=mesh,
                bc_line_id=f"bc_{element.lower()}_{kind.lower()}".ljust(32)))
    f.precipitation.set("Mode", "Gridded")
    f.precipitation.set("Constant Units", "mm/hr")
    f.precipitation.set("Point Interpolation", "")
    f.precipitation.set(
        "Gridded DSS Filename",
        r".\ExcessPrecip\JunJul_2003_Excess_Precipitation.dss")
    f.precipitation.set(
        "Gridded DSS Pathname",
        "//cedar-jun-jul-2003/PRECIPITATION/05JUN2003:0000/05JUN2003:0100/"
        "run:jun-jul-2003/")
    f.evapotranspiration.set("Mode", "None")
    f.evapotranspiration.set("Constant Units", "mm/hr")
    for series, units in (("Stage", "ft"), ("Flow", "cfs")):
        f.observed_time_series.append("\n".join([
            f"Observed Time Series={series}|TS Name=BC Line: Outlet",
            f"Observed Time Series={series}|TS Used=-1",
            f"Observed Time Series={series}|TS Source=DSS",
            f"Observed Time Series={series}|TS DSS Filename={GAGE_DSS}",
            f"Observed Time Series={series}|TS DSS Pathname=/Cedar Ck/"
            f"Granger, TX/{series.upper()}/01Jan1970-01Jan2024/1Day/USGS/",
            f"Observed Time Series={series}|TS Table Mode=0",
            f"Observed Time Series={series}|TS Table Use Fixed Start=0",
            f"Observed Time Series={series}|TS Table Interval=1 Hour",
            f"Observed Time Series={series}|TS Table Data Units={units}",
            f"Observed Time Series={series}|TS Table Data Type=INST-VAL",
            f"Observed Time Series={series}|TS Constant Units={units}",
        ]))
    return f


if __name__ == "__main__":
    out = Path(__file__).with_name("cedar_basin.u01")
    build().to_file(str(out))
    print(f"wrote {out}")
