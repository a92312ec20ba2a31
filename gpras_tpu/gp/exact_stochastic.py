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


def make_hutchinson_nlml(kernel: str, probes: int = 16, col_panel: int = 4096):
    """Returns ``nlml(params, x, y, key)`` with the stochastic backward."""

    def forward(params, x, y):
        n = x.shape[0]
        noise = jnp.exp(params["log_noise_variance"])
        jitter = linalg.default_jitter(x.dtype) * jnp.exp(params["log_variance"])
        k = K.gram(kernel, params, x)
        k = k + (noise + jitter) * jnp.eye(n, dtype=k.dtype)
        l = jnp.linalg.cholesky(k)
        alpha = linalg.cho_solve(l, y[:, None])[:, 0]
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
        n = x.shape[0]
        r = min(col_panel, n)
        while n % r != 0:
            r -= 1
        n_panels = n // r
        z = jax.random.rademacher(key, (n, probes), dtype=x.dtype)
        w = linalg.cho_solve(l, z)  # (N, m): K^{-1} Z
        inv_m = 1.0 / probes

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
                                  col_panel: int = 4096):
    nlml = make_hutchinson_nlml(kernel, probes, col_panel)

    def loss(params, x, y, key):
        return nlml(params, x, y, key) - log_prior(params)

    return loss
