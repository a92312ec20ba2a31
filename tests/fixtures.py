"""Synthetic HEC-RAS project fixtures (h5py-built), per SURVEY.md section 4's
test design: tiny HF/LF models with known low-rank flood structure, enabling
DataBuilder and end-to-end pipeline tests without real HEC-RAS output."""

from __future__ import annotations

import json
from pathlib import Path

import h5py
import numpy as np

MESH_ID = "mesh1"
TS_ROOT = "Results/Unsteady/Output/Output Blocks/Base Output/Unsteady Time Series"


def hydrograph(t_steps: int, peak: float = 3.0) -> np.ndarray:
    """Smooth pulse with warmup and recession tails (so temporal clipping has
    something to clip)."""
    t = np.linspace(0, 1, t_steps)
    return peak * np.exp(-((t - 0.45) ** 2) / 0.02)


def grid_mesh(nx: int, ny: int, cell: float):
    """Square-cell mesh in HEC-RAS HDF encoding: facepoint coords + per-cell
    facepoint indexes (-1 padded)."""
    xs = np.arange(nx + 1) * cell
    ys = np.arange(ny + 1) * cell
    pts = np.array([[x, y] for y in ys for x in xs], dtype=np.float64)

    def pid(ix, iy):
        return iy * (nx + 1) + ix

    fpi = np.full((nx * ny, 8), -1, dtype=np.int32)
    for iy in range(ny):
        for ix in range(nx):
            c = iy * nx + ix
            fpi[c, :4] = [pid(ix, iy), pid(ix + 1, iy),
                          pid(ix + 1, iy + 1), pid(ix, iy + 1)]
    return pts, fpi


def cell_centroids(nx: int, ny: int, cell: float) -> np.ndarray:
    cx = (np.arange(nx) + 0.5) * cell
    cy = (np.arange(ny) + 0.5) * cell
    return np.array([[x, y] for y in cy for x in cx])


def wse_field(cents: np.ndarray, elevations: np.ndarray, t_steps: int,
              amp: float, seed: int) -> np.ndarray:
    """Elevation + hydrograph * smooth spatial pattern (rank-2 + noise)."""
    rng = np.random.default_rng(seed)
    h = hydrograph(t_steps, peak=amp)
    pat1 = 1.0 + 0.3 * np.sin(cents[:, 0]) + 0.2 * np.cos(cents[:, 1])
    pat2 = 0.5 + 0.1 * cents[:, 0] / max(cents[:, 0].max(), 1)
    h2 = np.roll(h, 2)
    field = elevations[None, :] + np.outer(h, pat1) + np.outer(h2, pat2)
    field += 0.01 * rng.normal(size=field.shape)
    return np.maximum(field, elevations[None, :])


def timestamps(t_steps: int) -> np.ndarray:
    import pandas as pd

    idx = pd.date_range("2020-01-01", periods=t_steps, freq="h")
    return np.asarray([ts.strftime("%d%b%Y %H:%M:%S").upper().encode()
                       for ts in idx])


def write_plan_hdf(path: Path, plan_name: str, mesh_wse: np.ndarray,
                   elevations: np.ndarray, areas: np.ndarray,
                   pts: np.ndarray, fpi: np.ndarray,
                   geometry_title: str = "geom1",
                   ref_lines: dict[str, tuple[np.ndarray, np.ndarray]] | None = None,
                   precip: np.ndarray | None = None,
                   precip_meta: dict | None = None,
                   projection: str | None = None) -> None:
    t_steps = mesh_wse.shape[0]
    with h5py.File(path, "w") as f:
        if projection is not None:
            f.attrs["Projection"] = np.bytes_(projection.encode())
        info = f.create_group("Plan Data/Plan Information")
        info.attrs["Plan Name"] = np.bytes_(plan_name.encode())
        info.attrs["Geometry Title"] = np.bytes_(geometry_title.encode())
        geo = f.create_group(f"Geometry/2D Flow Areas/{MESH_ID}")
        geo.create_dataset("Cells Minimum Elevation", data=elevations)
        geo.create_dataset("Cells Surface Area", data=areas)
        geo.create_dataset("Cells FacePoint Indexes", data=fpi)
        geo.create_dataset("FacePoints Coordinate", data=pts)
        ts = f.create_group(f"{TS_ROOT}/2D Flow Areas/{MESH_ID}")
        ts.create_dataset("Water Surface", data=mesh_wse.astype(np.float32))
        vel = 0.1 * (mesh_wse - elevations[None, :])
        ts.create_dataset("Cell Velocity - Velocity X", data=vel.astype(np.float32))
        ts.create_dataset("Cell Velocity - Velocity Y", data=(0.5 * vel).astype(np.float32))
        f.create_dataset(f"{TS_ROOT}/Time Date Stamp", data=timestamps(t_steps))
        if ref_lines:
            rl = f.create_group(f"{TS_ROOT}/Reference Lines")
            names = np.asarray([n.encode() for n in ref_lines])
            rl.create_dataset("Name", data=names)
            flows = np.stack([v[0] for v in ref_lines.values()], axis=1)
            wses = np.stack([v[1] for v in ref_lines.values()], axis=1)
            rl.create_dataset("Flow", data=flows)
            rl.create_dataset("Water Surface", data=wses)
        if precip is not None:
            pr = f.create_group("Event Conditions/Meteorology/Precipitation")
            for k, v in (precip_meta or {}).items():
                pr.attrs[k] = v
            pr.create_dataset("Values", data=precip.astype(np.float32))
            import pandas as pd

            idx = pd.date_range("2020-01-01", periods=precip.shape[0], freq="h")
            stamps = np.asarray([ts.strftime("%d%b%Y %H:%M:%S.0").upper().encode()
                                 for ts in idx])
            pr.create_dataset("Timestamp", data=stamps)


def make_project(root: Path, name: str, nx: int, ny: int, cell: float,
                 plans: list[str], amp: float = 3.0, seed: int = 0,
                 elevation_fn=None, projection: str | None = None,
                 precip: np.ndarray | None = None,
                 precip_meta: dict | None = None) -> dict:
    """Write a synthetic RAS project (prj + per-plan HDFs + stac json).

    Returns dict with handy arrays (centroids, elevations, fields per plan).
    """
    root.mkdir(parents=True, exist_ok=True)
    pts, fpi = grid_mesh(nx, ny, cell)
    cents = cell_centroids(nx, ny, cell)
    if elevation_fn is None:
        elevations = 1.0 + 0.1 * cents[:, 0]
    else:
        elevations = elevation_fn(cents)
    areas = np.full(nx * ny, cell * cell)
    prj = root / f"{name}.prj"
    prj.write_text("Proj Title=synthetic\nCurrent Plan=p01\n")
    fields = {}
    t_steps = 40
    for i, plan in enumerate(plans):
        field = wse_field(cents, elevations, t_steps, amp * (1.0 + 0.2 * i),
                          seed + i)
        fields[plan] = field
        q = hydrograph(t_steps, peak=100.0 * (1 + i))
        ref = {
            "inflow": (q, 1.0 + elevations.mean() + 0.5 * np.log1p(q)),
            "outflow": (0.9 * q, elevations.mean() + 0.4 * np.log1p(q)),
        }
        write_plan_hdf(root / f"{name}.p{i+1:02d}.hdf", plan, field,
                       elevations, areas, pts, fpi, ref_lines=ref,
                       projection=projection, precip=precip,
                       precip_meta=precip_meta)
    stac = {
        "type": "Feature", "stac_version": "1.0.0", "id": name,
        "geometry": None, "properties": {"datetime": None}, "links": [],
        "assets": {p.name: {"href": str(p)} for p in sorted(root.glob(f"{name}.*"))
                   if not p.name.endswith(".stac.json")},
    }
    stac_path = root / f"{name}.stac.json"
    stac_path.write_text(json.dumps(stac))
    return {
        "root": root, "stac": stac_path, "centroids": cents,
        "elevations": elevations, "areas": areas, "fields": fields,
        "nx": nx, "ny": ny, "cell": cell,
    }


def write_aoi(path: Path, x0: float, y0: float, x1: float, y1: float) -> None:
    gj = {"type": "Feature", "geometry": {
        "type": "Polygon",
        "coordinates": [[[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]]]}}
    path.write_text(json.dumps(gj))


def write_event_plans(path: Path, train: list[str], test: list[str]) -> None:
    rows = ([{"plan_title": p, "event_number": i, "type": "Train", "set": "AEP"}
             for i, p in enumerate(train)]
            + [{"plan_title": p, "event_number": 100 + i, "type": "Test",
                "set": "AEP"} for i, p in enumerate(test)])
    path.write_text(json.dumps(rows))
