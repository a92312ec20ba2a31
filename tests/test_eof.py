"""EOF preprocessors: PCA parity with sklearn, round trips, variance propagation."""

import numpy as np
import jax.numpy as jnp
from sklearn.decomposition import PCA

from gpras_tpu.eof.pca import pca_fit
from gpras_tpu.eof.preprocessor import (
    HmsPreProcessor,
    PreProcessor,
    compute_norths_rule,
)


def low_rank_field(s=40, c=120, rank=3, noise=0.01, seed=0):
    """Synthetic flood field with known low-rank structure + cell elevations."""
    rng = np.random.default_rng(seed)
    t = np.linspace(0, 1, s)
    modes = np.stack([np.sin(2 * np.pi * (i + 1) * t) * 10 / (i + 1) for i in range(rank)], axis=1)
    spatial = rng.normal(size=(rank, c))
    field = modes @ spatial + noise * rng.normal(size=(s, c))
    return field


def test_pca_matches_sklearn():
    x = low_rank_field()
    x = x - x.mean(axis=0)
    comps, explained = pca_fit(jnp.asarray(x))
    comps, explained = np.asarray(comps), np.asarray(explained)
    sk = PCA()
    sk.fit(x)
    k = min(comps.shape[0], sk.components_.shape[0])
    np.testing.assert_allclose(explained[:5], sk.explained_variance_[:5], rtol=1e-6)
    for i in range(5):
        # same subspace up to sign
        dot = abs(np.dot(comps[i], sk.components_[i]))
        np.testing.assert_allclose(dot, 1.0, atol=1e-5)


def test_norths_rule_synthetic_spectrum():
    # first gap at/below sampling error is between modes 3 and 4 (0.1 <= 0.354)
    assert compute_norths_rule(np.array([100.0, 50.0, 25.0, 24.9, 1.1]), 10000) == 2
    # no degenerate gap anywhere -> keep all Kaiser modes
    assert compute_norths_rule(np.array([100.0, 50.0, 25.0, 1.2]), 10000) == 4
    # Kaiser alone: eigenvalues <= 1 dropped entirely
    assert compute_norths_rule(np.array([0.5, 0.1]), 100) == 0


def test_preprocessor_round_trip_wse():
    field = low_rank_field()
    elev = np.full(field.shape[1], -100.0)  # everything wet
    field = field + 0.0
    pp = PreProcessor(hydraulic_parameter="wse", wet_threshold=0.03)
    weights = np.ones(field.shape[1]) * 2.0
    pp.fit(field, elev, weights=weights, spatial_mode_count=3)
    modes = pp.transform(field)
    assert modes.shape == (field.shape[0], 3)
    # standardized
    np.testing.assert_allclose(modes.mean(axis=0), 0.0, atol=1e-8)
    np.testing.assert_allclose(modes.std(axis=0), 1.0, atol=1e-6)
    recon = pp.reverse_transform(modes)
    np.testing.assert_allclose(recon, field, atol=0.2)


def test_preprocessor_dry_cell_fill():
    field = low_rank_field(noise=0.0)
    elev = np.zeros(field.shape[1])
    # make first 10 cells always dry (field below elevation)
    field[:, :10] = -5.0
    elev[:10] = 100.0
    pp = PreProcessor(hydraulic_parameter="wse")
    pp.fit(field, elev, spatial_mode_count=3)
    assert pp.dry_indices[:10].all()
    recon = pp.reverse_transform(pp.transform(field))
    np.testing.assert_allclose(recon[:, :10], 100.0)  # dry cells -> elevation


def test_preprocessor_depth_mode_clamps_and_zero_fills():
    field = low_rank_field(noise=0.0)
    field = np.abs(field) + 1.0
    elev = np.zeros(field.shape[1])
    elev[:5] = 1e6  # always dry in depth space
    pp = PreProcessor(hydraulic_parameter="depth")
    pp.fit(field, elev, spatial_mode_count=3)
    recon = pp.reverse_transform(pp.transform(field))
    np.testing.assert_allclose(recon[:, :5], 0.0)  # dry cells -> depth 0


def test_variance_propagation_identity():
    """var_full = var_modes @ (diag(x_std) @ eofs / w)^2 elementwise-squared map."""
    field = low_rank_field()
    elev = np.full(field.shape[1], -100.0)
    w = np.linspace(1.0, 2.0, field.shape[1])
    pp = PreProcessor(hydraulic_parameter="wse")
    pp.fit(field, elev, weights=w, spatial_mode_count=3)
    var_modes = np.abs(np.random.default_rng(0).normal(size=(4, 3)))
    _, var_full = pp.reverse_transform(np.zeros((4, 3)), var_modes)
    a = (pp.x_std[:, None] * pp.eofs) / w[None, :]
    want = var_modes @ (a**2)
    np.testing.assert_allclose(var_full, want, rtol=1e-6)
    assert np.all(var_full >= 0)


def test_preprocessor_serialization_round_trip(tmp_path):
    field = low_rank_field()
    elev = np.full(field.shape[1], -100.0)
    pp = PreProcessor(hydraulic_parameter="wse")
    pp.fit(field, elev, weights=np.ones(field.shape[1]), spatial_mode_count=2)
    path = tmp_path / "pp.npz"
    pp.to_file(path)
    pp2 = PreProcessor.from_file(path)
    np.testing.assert_allclose(pp2.transform(field), pp.transform(field), rtol=1e-10)
    assert pp2.hydraulic_parameter == "wse"
    assert pp2.spatial_mode_count == 2


def test_hms_preprocessor_features_and_round_trip(tmp_path):
    rng = np.random.default_rng(0)
    s, n_bc, n_precip = 50, 2, 30
    x = np.concatenate([
        np.abs(rng.normal(size=(s, n_bc))) * 100,
        np.abs(rng.normal(size=(s, n_precip))),
    ], axis=1)
    bc_mask = np.array([True] * n_bc + [False] * n_precip)
    precip_mask = ~bc_mask
    hp = HmsPreProcessor()
    hp.fit(x, bc_mask, precip_mask, precip_spatial_mode_count=3)
    feats = hp.transform(x)
    # bc(2) + precip modes(3) + avg(1) + api1(1) + api2(1)
    assert feats.shape == (s, n_bc + 3 + 3)
    path = tmp_path / "hms.npz"
    hp.to_file(path)
    hp2 = HmsPreProcessor.from_file(path)
    np.testing.assert_allclose(hp2.transform(x), feats, rtol=1e-10)


def test_api_convolution_matches_definition():
    x = np.array([1.0, 0.0, 2.0, 0.0])
    api = HmsPreProcessor.calc_antecedent_precipitation_index(x, k=0.5)[:, 0]
    want = np.array([1.0, 0.5, 2.25, 1.125])
    np.testing.assert_allclose(api, want)


def test_api_event_reset_zero_cross_event_leakage():
    """Segment-reset convolution: event 2's API must equal the API computed on
    event 2 alone — no decayed tail of event 1 leaks across the boundary."""
    rng = np.random.default_rng(3)
    e1, e2 = rng.uniform(size=10), rng.uniform(size=7)
    x = np.concatenate([e1, e2])
    ev = np.array(["a"] * 10 + ["b"] * 7)
    api = HmsPreProcessor.calc_antecedent_precipitation_index(
        x, k=0.85, event_ids=ev)[:, 0]
    api_e1 = HmsPreProcessor.calc_antecedent_precipitation_index(e1, k=0.85)[:, 0]
    api_e2 = HmsPreProcessor.calc_antecedent_precipitation_index(e2, k=0.85)[:, 0]
    np.testing.assert_allclose(api[:10], api_e1, rtol=1e-12)
    np.testing.assert_allclose(api[10:], api_e2, rtol=1e-12)
    # without the reset the boundary rows differ (leakage is real)
    api_global = HmsPreProcessor.calc_antecedent_precipitation_index(x, k=0.85)[:, 0]
    assert abs(api_global[10] - api_e2[0]) > 1e-6


def test_hms_preprocessor_event_reset_flag_round_trip(tmp_path):
    rng = np.random.default_rng(4)
    s, n_bc, n_precip = 40, 2, 10
    x = np.abs(rng.normal(size=(s, n_bc + n_precip)))
    bc_mask = np.array([True] * n_bc + [False] * n_precip)
    ev = np.array(["e1"] * 20 + ["e2"] * 20)
    hp = HmsPreProcessor(event_reset=True)
    hp.fit(x, bc_mask, ~bc_mask, precip_spatial_mode_count=2, event_ids=ev)
    feats = hp.transform(x, event_ids=ev)
    # flag survives serialization
    path = tmp_path / "hms.npz"
    hp.to_file(path)
    hp2 = HmsPreProcessor.from_file(path)
    assert hp2.event_reset is True
    np.testing.assert_allclose(hp2.transform(x, event_ids=ev), feats, rtol=1e-10)
    # the reset actually changes the features vs the parity default
    hp_flat = HmsPreProcessor()
    hp_flat.fit(x, bc_mask, ~bc_mask, precip_spatial_mode_count=2)
    assert not np.allclose(hp_flat.transform(x), feats)


def test_pca_fit_reference_matches_device_path():
    """The host (numpy) PCA used for sub-threshold inputs must agree with the
    jitted Gram-trick path in both orientations (S<=F and S>F)."""
    import numpy as np
    import jax.numpy as jnp

    from gpras_tpu.eof.pca import pca_fit, pca_fit_reference

    rng = np.random.default_rng(11)
    for s, f in ((12, 40), (40, 12)):
        x = rng.normal(size=(s, f))
        x -= x.mean(axis=0)
        comps_d, ev_d = pca_fit(jnp.asarray(x))
        comps_h, ev_h = pca_fit_reference(x)
        k = min(s, f) - 1  # drop the ~0-eigenvalue centering direction
        np.testing.assert_allclose(np.asarray(ev_d)[:k], ev_h[:k], rtol=1e-8)
        np.testing.assert_allclose(np.asarray(comps_d)[:k], comps_h[:k],
                                   rtol=1e-6, atol=1e-8)


def test_preprocessor_host_and_device_paths_agree(monkeypatch):
    """GPRAS_EOF_HOST_ELEMENTS=0 forces the device path; the default takes
    the host path for this small field — both must produce the same
    transform/reverse_transform results."""
    import numpy as np

    from gpras_tpu.eof.preprocessor import PreProcessor

    rng = np.random.default_rng(3)
    x = np.maximum(rng.normal(size=(30, 64)) + 1.0, 0.0)
    elev = np.zeros(64)

    results = []
    for thresh in ("0", str(1 << 30)):
        monkeypatch.setenv("GPRAS_EOF_HOST_ELEMENTS", thresh)
        p = PreProcessor(hydraulic_parameter="depth")
        p.fit(x, elev)
        modes = p.transform(x)
        mean, var = p.reverse_transform(modes, np.abs(modes) * 0.1)
        results.append((modes, mean, var))
    for a, b in zip(results[0], results[1]):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-8)
