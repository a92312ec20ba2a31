"""Optimizer zoo: convergence, early-stop semantics, gradient-mask freezing."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gpras_tpu.fit import optimizers as opt
from gpras_tpu.gp import sgpr

N, D, M = 24, 2, 6


def make_problem(seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(N, D)))
    y = jnp.asarray(np.sin(np.asarray(x)[:, 0]) + 0.05 * rng.normal(size=(N,)))
    z = x[:M]
    params = sgpr.init_params("RBF", x, z, noise_variance=0.5)

    def loss_fn(p):
        return sgpr.training_loss("RBF", p, x, y)

    return params, loss_fn


def quadratic_problem():
    target = {"a": jnp.asarray([1.0, -2.0]), "b": jnp.asarray(3.0)}
    params = {"a": jnp.zeros(2), "b": jnp.asarray(0.0)}

    def loss_fn(p):
        return jnp.sum((p["a"] - target["a"]) ** 2) + (p["b"] - target["b"]) ** 2

    return params, loss_fn, target


def test_adam_reduces_loss():
    params, loss_fn = make_problem()
    before = float(loss_fn(params))
    fitted, info = opt.adam_fit(loss_fn, params, max_iter=60)
    assert float(info["loss"]) < before
    assert int(info["iterations"]) <= 60


def test_adam_early_stop_patience():
    """With an impossible tol every step is 'no improvement' after the first,
    so the loop must stop after patience+2 iterations (reference semantics:
    break when count > patience, gpras/gpr.py:167-173)."""
    params, loss_fn = make_problem()
    _, info = opt.adam_fit(loss_fn, params, max_iter=500, tol=1e30, patience=3)
    assert int(info["iterations"]) == 5  # 1 improving (vs inf) + 4 stalls


def test_adam_mask_freezes_parameters():
    params, loss_fn = make_problem()
    fitted, _ = opt.adam_fit(loss_fn, params, max_iter=10,
                             mask=opt.mask_only(params, ("z",)))
    for k in params:
        if k == "z":
            assert not np.allclose(np.asarray(fitted[k]), np.asarray(params[k]))
        else:
            np.testing.assert_array_equal(np.asarray(fitted[k]), np.asarray(params[k]))


def test_lbfgs_solves_quadratic():
    params, loss_fn, target = quadratic_problem()
    fitted, info = opt.lbfgs_fit(loss_fn, params, max_iter=50)
    np.testing.assert_allclose(np.asarray(fitted["a"]), np.asarray(target["a"]), atol=1e-5)
    np.testing.assert_allclose(float(fitted["b"]), float(target["b"]), atol=1e-5)


def test_lbfgs_mask_freezes_parameters():
    params, loss_fn, target = quadratic_problem()
    fitted, _ = opt.lbfgs_fit(loss_fn, params, max_iter=30,
                              mask={"a": jnp.asarray(1.0), "b": jnp.asarray(0.0)})
    np.testing.assert_allclose(np.asarray(fitted["a"]), np.asarray(target["a"]), atol=1e-5)
    assert float(fitted["b"]) == 0.0


def test_two_stage_improves_loss():
    params, loss_fn = make_problem()
    before = float(loss_fn(params))
    fitted, info = opt.two_stage_fit(loss_fn, params, max_iter=30)
    assert float(info["loss"]) < before


def test_three_stage_improves_loss():
    params, loss_fn = make_problem()
    before = float(loss_fn(params))
    fitted, info = opt.three_stage_fit(loss_fn, params, max_iter=15)
    assert float(info["loss"]) < before


def test_multi_start_improves_loss():
    params, loss_fn = make_problem()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(N, D)))
    before = float(loss_fn(params))
    fitted, info = opt.multi_start_fit(loss_fn, params, x=x, n_starts=4,
                                       iter_initial=5, iter_final=20)
    assert float(info["loss"]) < before
    assert info["restart_losses"].shape == (4,)


def test_de_fit_improves_loss_and_respects_bounds():
    params, loss_fn = make_problem()
    before = float(loss_fn(params))
    fitted, info = opt.de_fit(loss_fn, params, popsize=4, max_iter=10, adam_iter=5)
    assert float(info["loss"]) <= before
    lv = float(fitted["log_variance"]) / np.log(10)
    ln = float(fitted["log_noise_variance"]) / np.log(10)
    assert -1.0 - 1e-9 <= lv <= 1.0 + 1e-9
    assert -3.0 - 1e-9 <= ln <= 0.0 + 1e-9
    # scalar lengthscale broadcast, like the reference's assign (gpras/gpr.py:58)
    ls = np.asarray(fitted["log_lengthscales"])
    assert np.allclose(ls, ls[0])


def test_dispatcher_names_match_reference():
    for name in ["two-stage", "three-stage", "adam", "adadelta", "L-BFGS-B",
                 "stochastic", "diffential_evolution"]:
        assert name in opt.FITTERS


def test_dispatcher_rejects_unknown():
    with pytest.raises(ValueError):
        opt.fit(lambda p: 0.0, {}, method="nope")


def test_adam_lower_bounds_floor_params():
    """lower_bounds projects named params onto >= floor after every step."""
    params = {"log_noise_variance": jnp.asarray(0.0)}
    # gradient always pushes the param down hard
    loss_fn = lambda p: 10.0 * p["log_noise_variance"]
    fitted, _ = opt.adam_fit(loss_fn, params, max_iter=200, learning_rate=0.5,
                             lower_bounds={"log_noise_variance": -2.0})
    assert float(fitted["log_noise_variance"]) >= -2.0 - 1e-9


def test_adam_rejects_nonfinite_steps():
    """reject_nonfinite keeps params at the last finite iterate when the loss
    surface NaNs (AMP-GradScaler-style skip); without it the early stop bails
    immediately and the fit dies where it stood."""
    params = {"p": jnp.asarray(0.0)}

    def loss_fn(pp):
        p = pp["p"]
        return jnp.where(p < 1.0, (p - 2.0) ** 2, jnp.nan)

    fitted, info = opt.adam_fit(loss_fn, params, max_iter=500,
                                learning_rate=0.05, patience=10,
                                reject_nonfinite=True)
    assert np.isfinite(float(info["loss"]))
    assert float(fitted["p"]) < 1.0
    # pinned at the boundary -> terminated by patience, not max_iter
    assert int(info["iterations"]) < 500


def test_adam_nonfinite_loss_stops_early_without_rejection():
    params = {"p": jnp.asarray(2.0)}  # starts inside the NaN region

    def loss_fn(pp):
        p = pp["p"]
        return jnp.where(p < 1.0, (p - 2.0) ** 2, jnp.nan)

    _, info = opt.adam_fit(loss_fn, params, max_iter=500, patience=10)
    assert int(info["iterations"]) == 1  # bails on the first NaN


def test_lbfgs_chunked_matches_monolithic():
    """chunk=max_iter is one program; smaller chunks must reproduce the
    identical trajectory (the optax state, including the linesearch's
    cached value/grad, crosses the host boundary intact)."""
    params, loss_fn = make_problem()
    p_one, info_one = opt.lbfgs_fit_chunked(loss_fn, params, max_iter=12,
                                            chunk=12)
    p_chk, info_chk = opt.lbfgs_fit_chunked(loss_fn, params, max_iter=12,
                                            chunk=4)
    for k in p_one:
        np.testing.assert_allclose(np.asarray(p_chk[k]), np.asarray(p_one[k]),
                                   rtol=1e-6, atol=1e-8)
    l_one = np.asarray(info_one["losses"])
    l_chk = np.asarray(info_chk["losses"])
    np.testing.assert_allclose(l_chk, l_one, rtol=1e-6, atol=1e-8)
    assert float(np.nanmin(l_one)) < float(loss_fn(params))


def test_lbfgs_chunked_progress_callback():
    params, loss_fn = make_problem()
    seen = []
    opt.lbfgs_fit_chunked(loss_fn, params, max_iter=12, chunk=4,
                          progress=lambda done, best: seen.append((done,
                                                                   best)))
    assert [d for d, _ in seen] == [4, 8, 12]
    assert all(np.isfinite(b) for _, b in seen)
    # best is monotone non-increasing across chunks
    assert all(b2 <= b1 + 1e-12 for (_, b1), (_, b2) in zip(seen, seen[1:]))


def test_lbfgs_chunked_band_stop():
    """stop_loss halts at band entry (bench.py's band-entry semantics)
    without running to max_iter."""
    params, loss_fn = make_problem()
    # a full run establishes the reachable loss level
    _, info_full = opt.lbfgs_fit_chunked(loss_fn, params, max_iter=24,
                                         chunk=6)
    target = float(np.nanmin(np.asarray(info_full["losses"])[:12]))
    p, info = opt.lbfgs_fit_chunked(loss_fn, params, max_iter=24, chunk=6,
                                    stop_loss=target)
    assert info["stopped_by"] == "stop_loss_band"
    assert int(info["iterations"]) <= 18
    losses = np.asarray(info["losses"])
    assert np.nanmin(losses) <= target + 1e-5 * abs(target)


def test_lbfgs_chunked_mask_freezes():
    params, loss_fn = make_problem()
    fitted, _ = opt.lbfgs_fit_chunked(loss_fn, params, max_iter=8, chunk=4,
                                      mask=opt.mask_except(params, ("z",)))
    np.testing.assert_array_equal(np.asarray(fitted["z"]),
                                  np.asarray(params["z"]))


def test_lbfgs_cold_benchmark_smoke(monkeypatch, capsys):
    """benchmarks/lbfgs_cold.py runs end-to-end at tiny N on CPU and emits
    the JSON contract bench/PERFORMANCE cite (band/plateau protocol)."""
    import importlib
    import json
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent
                           / "benchmarks"))
    try:
        lbfgs_cold = importlib.import_module("lbfgs_cold")
    finally:
        sys.path.pop(0)
    monkeypatch.setattr(sys, "argv", ["lbfgs_cold.py", "512", "6", "3"])
    out = lbfgs_cold.main()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(line) == out
    assert out["n"] == 512 and out["engine"] == "hutchinson"
    assert out["stopped_by"] in ("max_iter", "plateau_rule")
    assert out["iterations"] >= 3 and out["best_loss"] is not None
    assert out["l_star"] is None  # no committed reference at this N


def _host_vag(loss_fn):
    vag = jax.jit(jax.value_and_grad(loss_fn))

    def f(p):
        v, g = vag(p)
        return float(v), g

    return f


def test_lbfgs_hostls_matches_quadratic_optimum():
    """On an exact quadratic the strong-Wolfe host L-BFGS must land on the
    minimizer in a handful of iterations."""
    params, loss_fn, target = quadratic_problem()
    p, info = opt.lbfgs_fit_hostls(_host_vag(loss_fn), params, max_iter=20)
    np.testing.assert_allclose(np.asarray(p["a"]), np.asarray(target["a"]),
                               atol=1e-5)
    np.testing.assert_allclose(float(p["b"]), float(target["b"]), atol=1e-5)
    assert float(info["loss"]) < 1e-9
    assert info["evals"] >= int(info["iterations"]) + 1


def test_lbfgs_hostls_matches_device_driver_quality():
    """Same SGPR problem: the host-linesearch driver reaches the optax
    zoom-linesearch driver's loss level (not bit-identical — different
    linesearch implementations — but the same basin and quality)."""
    params, loss_fn = make_problem()
    _, dev = opt.lbfgs_fit_chunked(loss_fn, params, max_iter=24, chunk=24)
    _, host = opt.lbfgs_fit_hostls(_host_vag(loss_fn), params, max_iter=24)
    dev_best = float(np.nanmin(np.asarray(dev["losses"])))
    assert float(host["loss"]) <= dev_best + 0.01 * abs(dev_best)


def test_lbfgs_hostls_band_and_floors():
    params, loss_fn = make_problem()
    _, full = opt.lbfgs_fit_hostls(_host_vag(loss_fn), params, max_iter=24)
    target = float(np.asarray(full["losses"])[4])
    p, banded = opt.lbfgs_fit_hostls(_host_vag(loss_fn), params, max_iter=24,
                                     stop_loss=target)
    assert banded["stopped_by"] == "stop_loss_band"
    assert int(banded["iterations"]) <= 8

    floor = {"log_noise_variance": 0.25}
    p, _ = opt.lbfgs_fit_hostls(_host_vag(loss_fn), params, max_iter=8,
                                floors=floor)
    assert float(p["log_noise_variance"]) >= 0.25 - 1e-9


def test_lbfgs_hostls_noise_plateau_stop():
    """min_decrease ends the fit right after the first accepted step that
    earns less than the threshold — the iterate trajectory up to the stop is
    identical to the unstopped run (the rule only truncates)."""
    params, loss_fn = make_problem()
    _, full = opt.lbfgs_fit_hostls(_host_vag(loss_fn), params, max_iter=24)
    losses = np.asarray(full["losses"])
    fin = losses[np.isfinite(losses)]
    earns = np.concatenate([[np.inf], fin[:-1] - fin[1:]])
    thresh = float(earns[len(earns) // 2]) + 1e-12  # mid-run earn as noise
    expect = int(np.argmax(earns < thresh)) + 1  # first sub-noise iteration

    _, stopped = opt.lbfgs_fit_hostls(_host_vag(loss_fn), params,
                                      max_iter=24, min_decrease=thresh)
    assert stopped["stopped_by"] == "noise_plateau"
    assert int(stopped["iterations"]) == expect
    np.testing.assert_array_equal(np.asarray(stopped["losses"])[:expect],
                                  losses[:expect])


def test_coldfit_stop_decrease_requires_hostls():
    from gpras_tpu.gp.coldfit import fit_exact

    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (64, 2), jnp.float32)
    y = jax.random.normal(jax.random.PRNGKey(4), (64,), jnp.float32)
    with pytest.raises(ValueError, match="host-linesearch"):
        fit_exact("Matern52", x, y, engine="hutchinson", stop_decrease=1.0)


def test_lbfgs_hostls_deterministic():
    params, loss_fn = make_problem()
    _, a = opt.lbfgs_fit_hostls(_host_vag(loss_fn), params, max_iter=10)
    _, b = opt.lbfgs_fit_hostls(_host_vag(loss_fn), params, max_iter=10)
    np.testing.assert_array_equal(np.asarray(a["losses"]),
                                  np.asarray(b["losses"]))
    assert a["evals"] == b["evals"]


def test_lbfgs_chunked_floors_projection():
    """floors are enforced at every chunk boundary."""
    params, loss_fn = make_problem()
    floor = {"log_noise_variance": 0.5}  # absurdly high: must bind
    fitted, _ = opt.lbfgs_fit_chunked(loss_fn, params, max_iter=8, chunk=4,
                                      floors=floor)
    assert float(fitted["log_noise_variance"]) >= 0.5 - 1e-6


def test_lbfgs_chunked_partial_final_chunk():
    """max_iter not a multiple of chunk: the driver must run EXACTLY
    max_iter iterations (each costs a full factorization at large N), not
    round up to the next chunk boundary."""
    params, loss_fn = make_problem()
    _, info = opt.lbfgs_fit_chunked(loss_fn, params, max_iter=10, chunk=4)
    assert int(info["iterations"]) == 10
    lv = np.asarray(info["losses"])
    assert lv.shape == (10,)
    assert np.isfinite(lv).all()
    # bit-identical to a divisible chunking over the same 10 iterations
    _, info_div = opt.lbfgs_fit_chunked(loss_fn, params, max_iter=10,
                                        chunk=5)
    np.testing.assert_allclose(lv, np.asarray(info_div["losses"]),
                               rtol=1e-6, atol=1e-8)


def test_lbfgs_chunked_neg_inf_not_band_entry():
    """A -inf loss (e.g. an underflowed logdet) must NOT satisfy the
    stop_loss band: band entry is a success claim, and a non-finite loss is
    never a converged fit."""
    params = {"a": jnp.asarray(2.0)}

    def loss_fn(p):
        # smooth descent toward a=0; the region a < 0.5 reports -inf
        return jnp.where(p["a"] < 0.5, -jnp.inf, (p["a"] - 0.0) ** 2)

    _, info = opt.lbfgs_fit_chunked(loss_fn, params, max_iter=12, chunk=4,
                                    stop_loss=-1e6, patience=3)
    assert info["stopped_by"] != "stop_loss_band"


def test_lbfgs_chunked_nan_chunk_reverts():
    """A chunk whose losses are NaN (here: a fit started inside the NaN
    region — optax's zoom linesearch and value cache make later entry
    near-impossible in a toy, but large-N estimators do NaN at accepted
    iterates) must revert to the pre-chunk params and stop as
    non_finite_chunk, never reporting NaN params as a fit result."""
    params = {"a": jnp.asarray(4.0)}

    def loss_fn(p):
        return jnp.where(p["a"] > 3.0, jnp.nan, p["a"] ** 2)

    fitted, info = opt.lbfgs_fit_chunked(loss_fn, params, max_iter=16,
                                         chunk=4)
    assert info["stopped_by"] == "non_finite_chunk"
    # the returned params are the (finite) pre-chunk iterate, not NaN
    np.testing.assert_allclose(float(fitted["a"]), 4.0)
