"""SVGP (uncollapsed Hensman bound): correctness anchors against SGPR.

The collapsed Titsias bound is the maximum of the uncollapsed bound over
q(u), so (a) any q gives ELBO_svgp <= ELBO_sgpr, and (b) the analytically
optimal q attains it exactly — the strongest possible check of every term
(projection, moments, closed-form Gaussian expectation, KL)."""

import numpy as np
import jax
import jax.numpy as jnp

from gpras_tpu.gp import sgpr, svgp


def make_data(n=96, m=12, d=3, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(n, d)))
    y = jnp.asarray(np.sin(np.asarray(x)[:, 0])
                    + 0.1 * rng.normal(size=n))
    z = x[:: n // m][:m]
    return x, y, z


def test_any_q_is_dominated_by_collapsed_bound():
    x, y, z = make_data()
    params = svgp.init_params("RBF", x, z, noise_variance=0.2)
    rng = np.random.default_rng(1)
    params["q_mu"] = jnp.asarray(rng.normal(size=params["q_mu"].shape))
    params["q_raw"] = jnp.asarray(
        0.3 * rng.normal(size=params["q_raw"].shape))
    lo = float(svgp.elbo("RBF", params, x, y, x.shape[0]))
    hi = float(sgpr.elbo("RBF", params, x, y))
    assert lo <= hi + 1e-9, (lo, hi)
    # init q(v) = N(0, I) has exactly zero KL
    p0 = svgp.init_params("RBF", x, z)
    np.testing.assert_allclose(float(svgp.kl_to_prior(p0)), 0.0, atol=1e-12)


def test_optimal_q_attains_collapsed_bound():
    x, y, z = make_data(seed=2)
    params = svgp.init_params("Matern52", x, z, noise_variance=0.3)
    p_opt = svgp.optimal_q("Matern52", params, x, y)
    lo = float(svgp.elbo("Matern52", p_opt, x, y, x.shape[0]))
    hi = float(sgpr.elbo("Matern52", params, x, y))
    np.testing.assert_allclose(lo, hi, rtol=1e-8)


def test_predict_matches_sgpr_at_optimal_q():
    """At the optimal q, the variational posterior IS the collapsed SGPR
    posterior — predictions must agree without seeing the training set."""
    x, y, z = make_data(seed=3)
    params = svgp.init_params("RBF", x, z, noise_variance=0.25)
    p_opt = svgp.optimal_q("RBF", params, x, y)
    xs = jnp.asarray(np.random.default_rng(4).normal(size=(17, x.shape[1])))
    m_ref, v_ref = sgpr.predict("RBF", params, x, y, xs, include_noise=True)
    m_got, v_got = svgp.predict("RBF", p_opt, xs, include_noise=True)
    np.testing.assert_allclose(np.asarray(m_got), np.asarray(m_ref),
                               rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(v_got), np.asarray(v_ref),
                               rtol=1e-7)


def test_q_sqrt_raw_round_trip():
    rng = np.random.default_rng(5)
    raw = jnp.asarray(rng.normal(size=(2, 6, 6)))
    qs = svgp.q_sqrt_from_raw(raw)
    assert np.all(np.triu(np.asarray(qs), 1) == 0.0)
    assert np.all(np.asarray(jnp.diagonal(qs, axis1=-2, axis2=-1)) > 0)
    back = svgp.raw_from_q_sqrt(qs)
    np.testing.assert_allclose(np.asarray(svgp.q_sqrt_from_raw(back)),
                               np.asarray(qs), rtol=1e-12)


def test_minibatch_fit_converges_toward_sgpr():
    """One jitted program (scan over epochs/batches) trains hyperparameters
    AND q jointly; the final full-data bound must approach the collapsed
    bound at the SAME hyperparameters (gap << the improvement from init)."""
    x, y, z = make_data(n=256, m=16, seed=6)
    params = svgp.init_params("RBF", x, z, noise_variance=0.5)
    fit = svgp.make_minibatch_fit("RBF", batch_size=32, epochs=150,
                                  learning_rate=0.02)
    p_fit, hist = fit(params, x, y, jax.random.PRNGKey(0))
    assert hist.shape == (150,)
    assert np.all(np.isfinite(np.asarray(hist)))
    lo0 = float(svgp.elbo("RBF", params, x, y, x.shape[0]))
    lo1 = float(svgp.elbo("RBF", p_fit, x, y, x.shape[0]))
    assert lo1 > lo0 + 10.0, (lo0, lo1)
    # at the fitted hyperparameters, the trained q should be near-optimal
    hi = float(sgpr.elbo("RBF", p_fit, x, y))
    assert hi - lo1 < 0.15 * (lo1 - lo0), (lo0, lo1, hi)


def test_predictions_after_minibatch_fit():
    x, y, z = make_data(n=256, m=16, seed=7)
    params = svgp.init_params("RBF", x, z, noise_variance=0.5)
    fit = svgp.make_minibatch_fit("RBF", batch_size=64, epochs=120,
                                  learning_rate=0.02)
    p_fit, _ = fit(params, x, y, jax.random.PRNGKey(1))
    mean, var = svgp.predict("RBF", p_fit, x)
    resid = np.asarray(mean) - np.asarray(y)
    r2 = 1.0 - np.var(resid) / np.var(np.asarray(y))
    assert r2 > 0.8, r2
    assert np.all(np.asarray(var) > 0)


def test_natgrad_full_batch_lr1_is_the_conjugate_jump():
    """One natural-gradient step at lr=1 on the FULL dataset lands exactly
    on the analytically optimal q from ANY starting q — so the fitted bound
    equals the collapsed SGPR bound."""
    x, y, z = make_data(seed=11)
    params = svgp.init_params("Matern52", x, z, noise_variance=0.3)
    rng = np.random.default_rng(12)
    params["q_mu"] = jnp.asarray(rng.normal(size=params["q_mu"].shape))
    params["q_raw"] = jnp.asarray(
        0.5 * rng.normal(size=params["q_raw"].shape))
    p_ng = svgp.natgrad_step("Matern52", params, x, y, x.shape[0], lr=1.0)
    lo = float(svgp.elbo("Matern52", p_ng, x, y, x.shape[0]))
    hi = float(sgpr.elbo("Matern52", params, x, y))
    np.testing.assert_allclose(lo, hi, rtol=1e-8)
    # and it matches optimal_q leaf-for-leaf (same S, same m)
    p_opt = svgp.optimal_q("Matern52", params, x, y)
    np.testing.assert_allclose(np.asarray(p_ng["q_mu"]),
                               np.asarray(p_opt["q_mu"]), rtol=1e-6,
                               atol=1e-10)
    s_ng = svgp.q_sqrt_from_raw(p_ng["q_raw"])
    s_opt = svgp.q_sqrt_from_raw(p_opt["q_raw"])
    np.testing.assert_allclose(np.asarray(s_ng @ jnp.swapaxes(s_ng, -1, -2)),
                               np.asarray(s_opt @ jnp.swapaxes(s_opt, -1, -2)),
                               rtol=1e-6, atol=1e-10)


def test_natgrad_minibatch_fit_beats_plain_adam():
    """NGD on q + Adam on hyperparameters closes the gap to the collapsed
    bound much faster than Adam on everything (the Cholesky-parameterized
    q is the slow direction)."""
    x, y, z = make_data(n=256, m=16, seed=13)
    params = svgp.init_params("RBF", x, z, noise_variance=0.5)
    ng = svgp.make_minibatch_fit("RBF", batch_size=64, epochs=30,
                                 learning_rate=0.02, natgrad=0.5)
    plain = svgp.make_minibatch_fit("RBF", batch_size=64, epochs=30,
                                    learning_rate=0.02)
    p_ng, hist = ng(params, x, y, jax.random.PRNGKey(0))
    p_plain, _ = plain(params, x, y, jax.random.PRNGKey(0))
    assert np.all(np.isfinite(np.asarray(hist)))
    lo_ng = float(svgp.elbo("RBF", p_ng, x, y, x.shape[0]))
    lo_plain = float(svgp.elbo("RBF", p_plain, x, y, x.shape[0]))
    # same epochs: NGD reaches a strictly better bound, and its residual
    # gap to the collapsed optimum (at its own hypers) is smaller — q is
    # the direction the conjugate step accelerates; the toy's remaining
    # bound movement is hyperparameter learning, which both share
    assert lo_ng > lo_plain, (lo_ng, lo_plain)
    gap_ng = float(sgpr.elbo("RBF", p_ng, x, y)) - lo_ng
    gap_plain = float(sgpr.elbo("RBF", p_plain, x, y)) - lo_plain
    assert gap_ng < 0.75 * gap_plain, (gap_ng, gap_plain)


def test_n_total_scaling_is_unbiased():
    """The minibatch data term averaged over all disjoint batches equals the
    full-batch data term (exactly, for a partition)."""
    x, y, z = make_data(n=64, m=8, seed=8)
    params = svgp.init_params("RBF", x, z, noise_variance=0.2)
    kl = float(svgp.kl_to_prior(params))
    full = float(svgp.elbo("RBF", params, x, y, 64))
    parts = [float(svgp.elbo("RBF", params, x[i:i + 16], y[i:i + 16], 64))
             for i in range(0, 64, 16)]
    # each part = scale*batch_loglik - KL; mean of parts = full
    np.testing.assert_allclose(np.mean(parts), full, rtol=1e-10)
    del kl


def test_stream_fit_matches_minibatch_fit_on_same_batch_stream():
    """make_stream_fit (host-streamed chunks) and make_minibatch_fit
    (device-resident) walk identical trajectories when fed the same batch
    order — the streaming trainer changes ingestion, not math."""
    n, bsz, epochs = 128, 32, 3
    x, y, z = make_data(n=n, m=8, seed=21)
    params = svgp.init_params("RBF", x, z, noise_variance=0.3)

    key = jax.random.PRNGKey(5)
    fit = svgp.make_minibatch_fit("RBF", batch_size=bsz, epochs=epochs,
                                  learning_rate=0.01, natgrad=0.5)
    p_ref, hist_ref = fit(params, x, y, key)

    # replicate the device shuffle on the host (same keys, same permutation)
    init, run_chunk = svgp.make_stream_fit("RBF", learning_rate=0.01,
                                           natgrad=0.5)
    p, s = params, init(params)
    y2 = y[:, None]
    nb = n // bsz
    losses = []
    for k in jax.random.split(key, epochs):
        perm = jax.random.permutation(k, n)[: nb * bsz]
        xc = x[perm].reshape(nb, bsz, x.shape[-1])
        yc = y2[perm].reshape(nb, bsz, 1)
        p, s, ls = run_chunk(p, s, xc, yc, n)
        losses.append(float(jnp.mean(ls)))

    for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-7)
    np.testing.assert_allclose(losses, np.asarray(hist_ref), rtol=1e-5)
