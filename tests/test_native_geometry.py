"""Native C++ geometry engine vs pure-Python references."""

import numpy as np
import pytest

from gpras_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain for the native engine")


def test_pip_batch_matches_matplotlib():
    from matplotlib.path import Path as MplPath

    rng = np.random.default_rng(0)
    ring = np.array([[0, 0], [4, 0], [4, 3], [2, 5], [0, 3]], dtype=float)
    pts = rng.uniform(-1, 6, size=(500, 2))
    got = native.pip_batch(ring, pts)
    want = MplPath(np.vstack([ring, ring[:1]])).contains_points(pts)
    # boundary-grazing points may differ; interior/exterior must agree
    disagree = got != want
    assert disagree.mean() < 0.01


def test_clip_area_convex_known_values():
    sq = np.array([[0, 0], [2, 0], [2, 2], [0, 2]], dtype=float)
    # identical squares
    assert native.clip_area_convex(sq, sq) == pytest.approx(4.0)
    # half-overlapping square
    sq2 = sq + np.array([1.0, 0.0])
    assert native.clip_area_convex(sq, sq2) == pytest.approx(2.0)
    # disjoint
    sq3 = sq + np.array([5.0, 0.0])
    assert native.clip_area_convex(sq, sq3) == pytest.approx(0.0)
    # clockwise input handled (orientation normalized)
    assert native.clip_area_convex(sq[::-1], sq2[::-1]) == pytest.approx(2.0)
    # triangle clipped by square
    tri = np.array([[1, 1], [3, 1], [1, 3]], dtype=float)
    assert native.clip_area_convex(tri, sq) == pytest.approx(1.0)  # the [1,2]^2 square


def test_best_overlap_batch_picks_dominant():
    # query unit cell [0,1]^2; candidates: left strip (60% overlap) vs right
    # strip (40%)
    q_verts = np.array([[[0, 0], [1, 0], [1, 1], [0, 1]]], dtype=float)
    q_counts = np.array([4], dtype=np.int32)
    left = [[-1, 0], [0.6, 0], [0.6, 1], [-1, 1]]
    right = [[0.6, 0], [2, 0], [2, 1], [0.6, 1]]
    c_verts = np.array([left, right], dtype=float)
    c_counts = np.array([4, 4], dtype=np.int32)
    cand = np.array([[0, 1]], dtype=np.int32)
    best, area = native.best_overlap_batch(q_verts, q_counts, c_verts, c_counts, cand)
    assert best[0] == 0
    assert area[0] == pytest.approx(0.6)


def test_polyline_touches_poly():
    ring = np.array([[0, 0], [2, 0], [2, 2], [0, 2]], dtype=float)
    crossing = np.array([[-1, 1], [3, 1]], dtype=float)
    outside = np.array([[-1, -1], [-1, 5]], dtype=float)
    inside_pt = np.array([[1, 1], [1.5, 1.5]], dtype=float)
    assert native.polyline_touches_poly(crossing, ring)
    assert not native.polyline_touches_poly(outside, ring)
    assert native.polyline_touches_poly(inside_pt, ring)


def test_convex_ring_mask():
    from gpras_tpu.data.builders import _convex_ring_mask

    square = [[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]]  # pad slot reused
    # L-shaped (concave) hexagon
    ell = [[0, 0], [2, 0], [2, 1], [1, 1], [1, 2], [0, 2]]
    # square with a collinear midpoint on one edge — still convex
    collinear = [[0, 0], [1, 0], [2, 0], [2, 2], [0, 2], [0, 0]]
    verts = np.zeros((3, 6, 2))
    verts[0, :5] = square
    verts[1, :6] = ell
    verts[2, :6] = collinear
    counts = np.array([4, 6, 5], dtype=np.int32)
    got = _convex_ring_mask(verts, counts)
    np.testing.assert_array_equal(got, [True, False, True])


def test_concave_hf_cells_fall_back_to_centroid_rule(monkeypatch, tmp_path):
    """A concave HF query ring must not be paired by the clipper (which is only
    exact for convex clips) — it takes the nearest-centroid rule instead."""
    import fixtures as fx
    from gpras_tpu.data import builders as B
    from gpras_tpu.data.geometry import Polygon
    from gpras_tpu.data.ras_model import RasModel

    plans = ["e1"]
    hf = fx.make_project(tmp_path / "hf", "hfm", nx=6, ny=6, cell=1.0, plans=plans)
    lf = fx.make_project(tmp_path / "lf", "lfm", nx=3, ny=3, cell=2.0, plans=plans)
    aoi = tmp_path / "aoi.geojson"
    fx.write_aoi(aoi, 0.2, 0.2, 5.8, 5.8)
    # force every ring to be treated as concave: the exact path must then agree
    # with the pure nearest-centroid fallback everywhere
    monkeypatch.setattr(B, "_convex_ring_mask",
                        lambda v, c: np.zeros(len(c), dtype=bool))
    b = B.RasUpskillDataBuilder(
        hf_ras=RasModel.from_stac(hf["stac"]),
        lf_ras=RasModel.from_stac(lf["stac"]), mesh_id=fx.MESH_ID,
        plans=plans, area_of_interest=Polygon.from_geojson_file(aoi))
    lf_idx = b._lf_mesh_aoi_indices
    lf_ids = b._lf_mesh.cell_ids[lf_idx]
    want = lf_ids[b._lf_submesh_containing(b.hf_centroids_aoi)]
    np.testing.assert_array_equal(np.asarray(b.lf_resampler), want)


def test_builder_exact_overlap_matches_centroid_on_aligned_grids(tmp_path):
    """On 2x aligned coarsening the exact pairing must equal the centroid rule."""
    import fixtures as fx
    from gpras_tpu.data.builders import RasUpskillDataBuilder
    from gpras_tpu.data.geometry import Polygon
    from gpras_tpu.data.ras_model import RasModel

    plans = ["e1"]
    hf = fx.make_project(tmp_path / "hf", "hfm", nx=6, ny=6, cell=1.0, plans=plans)
    lf = fx.make_project(tmp_path / "lf", "lfm", nx=3, ny=3, cell=2.0, plans=plans)
    aoi = tmp_path / "aoi.geojson"
    fx.write_aoi(aoi, 0.2, 0.2, 5.8, 5.8)
    b = RasUpskillDataBuilder(
        hf_ras=RasModel.from_stac(hf["stac"]),
        lf_ras=RasModel.from_stac(lf["stac"]), mesh_id=fx.MESH_ID,
        plans=plans, area_of_interest=Polygon.from_geojson_file(aoi))
    # exact engine ran (native available in this test module)
    hf_cents = b.hf_centroids_aoi
    want = (hf_cents[:, 1] // 2).astype(int) * 3 + (hf_cents[:, 0] // 2).astype(int)
    np.testing.assert_array_equal(np.asarray(b.lf_resampler), want)
