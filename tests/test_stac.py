"""STAC item read/write (RasModel.to_stac/from_stac) — hecstac-style item
richness (production/pre_processing/make_ras_stac.py:6-13) without hecstac,
plus interop with FFRD-style items that use arbitrary asset keys."""

import json

import numpy as np

import tests.fixtures as fx
from gpras_tpu.data.ras_model import RasModel

WKT = ('PROJCS["Albers",GEOGCS["NAD83",DATUM["North_American_Datum_1983",'
       'SPHEROID["GRS 1980",6378137,298.257222101]],PRIMEM["Greenwich",0],'
       'UNIT["degree",0.0174532925199433]],PROJECTION["Albers_Conic_Equal_Area"],'
       'PARAMETER["latitude_of_center",23],PARAMETER["longitude_of_center",-96],'
       'PARAMETER["standard_parallel_1",29.5],PARAMETER["standard_parallel_2",45.5],'
       'UNIT["metre",1]]')


def _project(tmp_path):
    return fx.make_project(tmp_path / "m", "casper", nx=4, ny=3, cell=10.0,
                           plans=["plan_a", "plan_b"], projection=WKT)


def test_to_stac_item_richness(tmp_path):
    proj = _project(tmp_path)
    model = RasModel.from_stac(proj["stac"])
    out = tmp_path / "item.stac.json"
    model.to_stac(out)
    item = json.loads(out.read_text())

    assert item["stac_version"] == "1.0.0"
    assert item["type"] == "Feature"
    assert item["id"] == "casper"
    # STAC 1.0 / RFC 7946: geometry + bbox are WGS84 lon/lat. The mesh sits
    # at the Albers origin (lat_0=23, lon_0=-96), 40 x 30 m -> a few 1e-4 deg
    bbox = item["bbox"]
    assert abs(bbox[0] - (-96.0)) < 1e-6 and abs(bbox[1] - 23.0) < 1e-6
    assert 0 < bbox[2] - bbox[0] < 0.01 and 0 < bbox[3] - bbox[1] < 0.01
    ring = item["geometry"]["coordinates"][0]
    assert ring[0] == ring[-1]
    assert all(-97 < p[0] < -95 and 22 < p[1] < 24 for p in ring)
    # the native-CRS extent moves to the projection extension
    assert item["properties"]["proj:bbox"] == [0.0, 0.0, 40.0, 30.0]
    nring = item["properties"]["proj:geometry"]["coordinates"][0]
    assert nring[0] == nring[-1] == [0.0, 0.0] and len(nring) == 5
    # projection extension
    assert item["properties"]["proj:wkt2"] == WKT
    assert any("projection" in e for e in item["stac_extensions"])
    # datetime is a real UTC timestamp, not null
    assert item["properties"]["datetime"].endswith("Z")
    # asset roles + media types from the HEC-RAS filename grammar
    a = item["assets"]
    assert a["casper.prj"]["roles"] == ["project-file"]
    assert a["casper.p01.hdf"]["type"] == "application/x-hdf"
    assert a["casper.p01.hdf"]["roles"] == ["ras-plan", "results"]


def test_stac_round_trip(tmp_path):
    proj = _project(tmp_path)
    model = RasModel.from_stac(proj["stac"])
    out = tmp_path / "item.stac.json"
    model.to_stac(out)
    back = RasModel.from_stac(out)
    assert back.id == model.id
    assert set(back.plan_hdfs) == {"plan_a", "plan_b"}
    np.testing.assert_allclose(
        back.get_cell_areas("plan_a", fx.MESH_ID), proj["areas"])


def test_from_stac_with_ffrd_style_asset_keys(tmp_path):
    """Real FFRD catalogs key assets 'plan-01'/'geometry' etc.; from_stac
    keys by href FILENAME so arbitrary keys and relative hrefs both work."""
    proj = _project(tmp_path)
    orig = json.loads(proj["stac"].read_text())
    weird = {
        "type": "Feature", "stac_version": "1.0.0", "id": "casper",
        "geometry": None, "properties": {"datetime": None}, "links": [],
        "assets": {
            f"asset-{i:02d}": {"href": asset["href"]}
            for i, (_, asset) in enumerate(sorted(orig["assets"].items()))
        },
    }
    p = proj["root"] / "weird.stac.json"
    p.write_text(json.dumps(weird))
    model = RasModel.from_stac(p)
    assert set(model.plan_hdfs) == {"plan_a", "plan_b"}


def test_to_stac_without_geometry_or_projection(tmp_path):
    """A bare project (no HDFs) still writes a valid item with null
    geometry and no proj extension."""
    root = tmp_path / "bare"
    root.mkdir()
    prj = root / "empty.prj"
    prj.write_text("Proj Title=empty\n")
    model = RasModel(prj)
    out = root / "empty.stac.json"
    model.to_stac(out)
    item = json.loads(out.read_text())
    assert item["geometry"] is None
    assert "bbox" not in item
    assert item["stac_extensions"] == []
    assert "proj:wkt2" not in item["properties"]
