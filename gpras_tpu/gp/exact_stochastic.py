"""Stochastic-trace (Hutchinson) backward for the exact-GP NLML at large N.

The exact gradient needs tr(K^{-1} dK/dtheta), which costs a full O(N^3)
inverse reconstruction per step (gp/exact_lean.py). The BBMM/GPyTorch insight
(PAPERS.md: Gardner et al., "Blackbox Matrix-Matrix Gaussian Process
Inference") is that Adam-style optimizers tolerate an unbiased estimate:

    tr(K^{-1} dK) ~= (1/m) sum_i (K^{-1} z_i)^T dK z_i,   z_i Rademacher

With the factor already computed, the whole backward becomes:
- one (N, m) triangular solve   (W = K^{-1} Z),
- one pass over Gram tiles, contracting each tile against the **rank-(m+1)**
  cotangent  0.5 g [ (1/m) W Z^T - alpha alpha^T ]  assembled tile-by-tile.

Cost: O(N^2 (m + panel)) — for m = 16 probes that is ~1-2 extra Gram passes
instead of the O(N^3) inverse, which turns the backward from the dominant cost
into a rounding error on top of the forward Cholesky.

Loss values stay exact (logdet comes from the factor's diagonal); only the
trace term of the gradient is stochastic. Pass a fresh PRNG key per step for
unbiased noise; a fixed key gives deterministic (biased-like SAA) behavior.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from gpras_tpu.gp.priors import log_prior
from gpras_tpu.ops import kernels as K
from gpras_tpu.ops import linalg

Array = jax.Array


def make_hutchinson_nlml(kernel: str, probes: int = 16, col_panel: int = 4096,
                         chol: str = "xla", chol_w: int = 2048,
                         chol_strip: int = 16384,
                         chol_precision: str = "high"):
    """Returns ``nlml(params, x, y, key)`` with the stochastic backward.

    ``chol`` picks the factorization/solve engine:
    - ``"xla"``: jnp.linalg.cholesky — fastest compile at small/moderate N,
      but its lowering (and HBM footprint: separate K and L buffers) grows
      with N; impractical beyond ~16k on one chip in this stack.
    - ``"super"``: ops.block_cholesky.super_cholesky (shrinking static
      trailing updates, in-place, ~1.8x faster than the XLA factorization at
      N=16k and flat compile cost) + flat-compile panel solves. The N>=32k
      configuration. ``chol_precision`` sets its MXU matmul precision —
      "high" (bf16_3x, f32-equivalent, the stable default) / "highest" /
      "default" (1-pass bf16: fast but diverges once the fitted noise gets
      small, see super_cholesky's docstring). The forward Gram also switches
      to the fused Pallas builder so K occupies a single (N, N) buffer with
      the noise diagonal added in-kernel.
    - ``"blocked"``: ops.block_cholesky.blocked_cholesky (fori_loop masked
      full-width updates) — kept for tiny-HLO debugging.
    """

    if chol == "super":
        from gpras_tpu.ops.block_cholesky import (blocked_cho_solve, fit_block,
                                                  super_cholesky)
        from gpras_tpu.ops.pallas_gram import gram as fused_gram
        # zero_upper=False: the tril is a second (N, N) buffer; the panel
        # solves and diag logdet below never read above the diagonal.
        # fit_block: the panel width must divide N (arbitrary event counts);
        # worst case w == N degenerates to one direct small factorization.
        chol_fn = lambda k: super_cholesky(
            k, fit_block(k.shape[0], chol_w), chol_strip,
            chol_precision, zero_upper=False)
        solve_fn = lambda l, r: blocked_cho_solve(l, r, 512)
    elif chol == "blocked":
        from gpras_tpu.ops.block_cholesky import blocked_cho_solve, blocked_cholesky
        fused_gram = None
        chol_fn = lambda k: blocked_cholesky(k, chol_w)
        solve_fn = lambda l, r: blocked_cho_solve(l, r, 512)
    else:
        fused_gram = None
        chol_fn = jnp.linalg.cholesky
        solve_fn = linalg.cho_solve

    def forward(params, x, y):
        n = x.shape[0]
        noise = jnp.exp(params["log_noise_variance"])
        jitter = linalg.default_jitter(x.dtype) * jnp.exp(params["log_variance"])
        if fused_gram is not None:
            k = fused_gram(kernel, params, x, noise=noise + jitter)
        else:
            k = K.gram(kernel, params, x)
            k = k + (noise + jitter) * jnp.eye(n, dtype=k.dtype)
        l = chol_fn(k)
        alpha = solve_fn(l, y[:, None])[:, 0]
        quad = 0.5 * jnp.vdot(y, alpha)
        logdet = linalg.logdet_from_chol(l)
        return quad + 0.5 * logdet + 0.5 * n * math.log(2.0 * math.pi), (l, alpha)

    @jax.custom_vjp
    def nlml(params, x, y, key):
        return forward(params, x, y)[0]

    def fwd(params, x, y, key):
        out, (l, alpha) = forward(params, x, y)
        return out, (params, x, y, key, l, alpha)

    def bwd(res, g):
        params, x, y, key, l, alpha = res
        # upstream weak-f64 arithmetic on the loss (e.g. optax's zoom
        # linesearch under jax_enable_x64) can deliver a promoted cotangent;
        # the engine computes in the data dtype
        g = jnp.asarray(g, x.dtype)
        n = x.shape[0]
        from gpras_tpu.ops.block_cholesky import fit_block

        r = fit_block(n, col_panel)
        n_panels = n // r
        z = jax.random.rademacher(key, (n, probes), dtype=x.dtype)
        w = solve_fn(l, z)  # (N, m): K^{-1} Z
        inv_m = 1.0 / probes
        if n >= 2048 and kernel in K.STATIONARY_KERNELS and \
                x.dtype == jnp.float32 and \
                jax.devices()[0].platform == "tpu":
            # fused Pallas cotangent contraction (see exact_cg.bwd): the
            # panel loop's Gram tiles + autodiff residuals never hit HBM
            from gpras_tpu.ops.pallas_gram import pallas_kgrad

            pg = pallas_kgrad(kernel, params, x, w, z, alpha, g=g,
                              inv_m=inv_m)
            diag_sum = 0.5 * g * (inv_m * jnp.sum(w * z)
                                  - jnp.sum(alpha * alpha))
            grads = jax.tree.map(jnp.zeros_like, params)
            grads["log_variance"] = pg["log_variance"].astype(x.dtype)
            grads["log_lengthscales"] = \
                pg["log_lengthscales"].astype(x.dtype)
            grads["log_noise_variance"] = grads["log_noise_variance"] + \
                diag_sum * jnp.exp(params["log_noise_variance"])
            grads["log_variance"] = grads["log_variance"] + \
                diag_sum * linalg.default_jitter(x.dtype) * \
                jnp.exp(params["log_variance"])
            return grads, jnp.zeros_like(x), g * alpha, None

        def panel_step(j, carry):
            grads_acc, diag_acc = carry
            cols = j * r + jnp.arange(r)
            # rank-(m+1) cotangent tile: 0.5 g [(1/m) W Z_p^T - alpha alpha_p^T]
            kbar = 0.5 * g * (inv_m * (w @ z[cols].T)
                              - alpha[:, None] * alpha[cols][None, :])
            diag_acc = diag_acc + jnp.sum(kbar[cols, jnp.arange(r)])
            _, pullback = jax.vjp(
                lambda pp: K.gram(kernel, pp, x, x[cols]), params)
            (grads_t,) = pullback(kbar)
            return jax.tree.map(jnp.add, grads_acc, grads_t), diag_acc

        zero = jax.tree.map(jnp.zeros_like, params)
        grads, diag_sum = jax.lax.fori_loop(
            0, n_panels, panel_step, (zero, jnp.zeros((), x.dtype)))
        grads["log_noise_variance"] = grads["log_noise_variance"] + \
            diag_sum * jnp.exp(params["log_noise_variance"])
        grads["log_variance"] = grads["log_variance"] + \
            diag_sum * linalg.default_jitter(x.dtype) * jnp.exp(params["log_variance"])
        return grads, jnp.zeros_like(x), g * alpha, None

    nlml.defvjp(fwd, bwd)
    return nlml


def make_hutchinson_training_loss(kernel: str, probes: int = 16,
                                  col_panel: int = 4096, **chol_kwargs):
    nlml = make_hutchinson_nlml(kernel, probes, col_panel, **chol_kwargs)

    def loss(params, x, y, key):
        return nlml(params, x, y, key) - log_prior(params)

    return loss


def default_chol_config(n: int) -> dict:
    """The measured factorization knobs for problem size ``n`` — the SINGLE
    source of truth shared by GPRAS._loss_fn, gp.coldfit, and bench.py.

    Values from the round-3 TPU sweeps (bench.py sweep log in _robust_loss's
    docstring / docs/PERFORMANCE.md): the in-place super-panel engine above
    16k (XLA's cholesky lowering takes unbounded compile time there and
    needs separate K+L buffers), wide (w=2048, strip=16384) panels up to
    32k, narrow (w=512, strip=2048) panels above it (at 49k the factor
    alone is ~9.7 of 16 GB HBM, and narrow panels shed panel-solve FLOPs
    faster than the serial inner-diagonal cost grows: 8.68 s vs 9.34 s for
    the 10-step fit).
    """
    return {
        "chol": "super" if n > 16384 else "xla",
        "chol_strip": 16384 if n <= 32768 else 2048,
        "chol_w": 2048 if n < 32768 else 512,
    }
