"""Matrix-free exact-GP NLML: batched conjugate gradients + stochastic
Lanczos quadrature (the full BBMM algorithm of Gardner et al. 2018, GPyTorch's
large-N engine — see PAPERS.md).

Every other exact engine in this package (gp/exact.py, exact_lean.py,
exact_stochastic.py) materializes the (N, N) kernel matrix and factorizes it:
O(N^2) HBM caps one 16 GB chip near N = 60k. This engine never stores K at
all:

- ``kmv``: K @ V evaluated in **row panels** inside a ``lax.fori_loop`` —
  each iteration rebuilds the (panel, N) Gram tile from x on the fly (one MXU
  matmul + elementwise tail) and contracts it with V. Peak memory is
  O(N * (panel + rhs)); compute per matvec-batch is one full Gram pass.
- ``mbcg``: modified batched CG (Saad alg. 6.18 with per-column scalars) that
  solves K [y, Z] = [b...] for the target and m probe vectors SIMULTANEOUSLY
  (the Gram pass is amortized over all columns), while recording the Lanczos
  tridiagonal coefficients of every probe column.
- NLML value: quad term from the y-solve (exact up to CG tolerance); logdet
  from SLQ — logdet ~= (1/m) sum_i ||z_i||^2 e1' log(T_i) e1 with T_i the
  probe's tridiagonal (eigh of a (k, k) matrix, trivially in-graph).
- NLML gradient (custom VJP): the same rank-(m+1) cotangent as
  exact_stochastic —  Kbar = 0.5 g [(1/m) W Z' - alpha alpha'] with
  W = K^{-1} Z already produced by the SAME CG solves — contracted against
  dK/dtheta one Gram **column panel** at a time. No factor, no O(N^3) step
  anywhere: a training step costs (iters + 2) Gram passes = O(N^2 (d + m)).

Cost model on v5e (measured rates in ops/block_cholesky.py docstring): one
Gram pass at N=131k is ~0.5 s at 'high' matmul precision, so 30 CG iterations
fit a step in ~15 s where every factorization engine is out of memory by 64x.

Numerics: CG on a f32 kernel matrix with the default relative jitter behaves
like GPyTorch's f32 BBMM; convergence is governed by cond(K) ~ var/noise.
A Jacobi preconditioner is pointless (the diagonal is constant for stationary
kernels); ``max_iters`` is the accuracy dial, and all reductions accumulate
in f32.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from gpras_tpu.gp.priors import log_prior
from gpras_tpu.ops import kernels as K
from gpras_tpu.ops import linalg

Array = jax.Array


def _fit_panel(n: int, target: int) -> int:
    p = min(target, n)
    while n % p != 0:
        p -= 1
    return p


def kmv(kernel: str, params: dict[str, Array], x: Array, v: Array,
        noise: Array, row_panel: int = 4096,
        precision: str = "high") -> Array:
    """(K(x,x) + noise I) @ v without materializing K.

    v: (N, R). Returns (N, R). On TPU with a stationary kernel this is the
    fused Pallas kernel (ops/pallas_gram.pallas_kmv): each covariance tile is
    built and contracted in VMEM, so HBM traffic is O(N (D + R)) instead of
    the XLA path's O(N^2) tile round-trip. Off-TPU / non-stationary falls
    back to a fori_loop over (panel, N) Gram tiles.
    """
    n = x.shape[0]
    if n >= 2048 and kernel in K.STATIONARY_KERNELS and \
            jax.devices()[0].platform == "tpu":
        from gpras_tpu.ops.pallas_gram import pallas_kmv

        return pallas_kmv(kernel, params, x, v, noise=noise)
    p = _fit_panel(n, row_panel)
    n_panels = n // p

    def body(j, out):
        r0 = j * p
        x_rows = jax.lax.dynamic_slice_in_dim(x, r0, p, axis=0)
        tile = K.gram(kernel, params, x_rows, x)  # (p, N)
        upd = jnp.matmul(tile, v, precision=precision,
                         preferred_element_type=v.dtype)
        return jax.lax.dynamic_update_slice_in_dim(out, upd, r0, axis=0)

    out = jax.lax.fori_loop(0, n_panels, body, jnp.zeros_like(v))
    return out + noise * v


def mbcg(matvec, b: Array, max_iters: int = 32, tol: float = 1e-6):
    """Modified batched CG: solve A X = b per column, recording Lanczos
    tridiagonal coefficients.

    b: (N, R). Returns (x, alphas, betas) where alphas/betas are
    (max_iters, R) Lanczos recurrence coefficients (diag / off-diag of T are
    derived from them the standard way). Always runs ``max_iters`` iterations
    (static shapes; converged columns freeze via the tolerance mask), which
    keeps the program one fori_loop regardless of conditioning.
    """
    n, r = b.shape
    b2 = jnp.sum(b * b, axis=0)
    stop2 = (tol * tol) * b2

    def body(i, carry):
        x, p, res, rz, alphas, betas, done = carry
        ap = matvec(p)
        pap = jnp.sum(p * ap, axis=0)
        alpha = jnp.where(pap > 0, rz / jnp.maximum(pap, 1e-30), 0.0)
        alpha = jnp.where(done, 0.0, alpha)
        x = x + alpha[None, :] * p
        res = res - alpha[None, :] * ap
        rz_new = jnp.sum(res * res, axis=0)
        beta = jnp.where(rz > 0, rz_new / jnp.maximum(rz, 1e-30), 0.0)
        beta = jnp.where(done, 0.0, beta)
        p = res + beta[None, :] * p
        alphas = alphas.at[i].set(alpha)
        betas = betas.at[i].set(beta)
        done = done | (rz_new <= stop2)
        return x, p, res, rz_new, alphas, betas, done

    x0 = jnp.zeros_like(b)
    alphas = jnp.zeros((max_iters, r), b.dtype)
    betas = jnp.zeros((max_iters, r), b.dtype)
    done0 = jnp.zeros((r,), bool)
    x, _, res, _, alphas, betas, _ = jax.lax.fori_loop(
        0, max_iters, body, (x0, b, b, b2, alphas, betas, done0))
    return x, alphas, betas


def _slq_logdet_from_coeffs(alphas: Array, betas: Array, b2: Array,
                            n: int) -> Array:
    """Stochastic Lanczos quadrature: rebuild each probe's tridiagonal T from
    its CG coefficients and average ||z||^2 e1' log(T) e1.

    alphas/betas: (k, m) CG step/conjugacy coefficients for the m PROBE
    columns; b2: (m,) squared probe norms. Standard identities
    (Saad; GPyTorch's linear_cg): T[0,0] = 1/alpha_0,
    T[j,j] = 1/alpha_j + beta_{j-1}/alpha_{j-1},
    T[j-1,j] = T[j,j-1] = sqrt(beta_{j-1})/alpha_{j-1}.
    Zero alphas (frozen converged columns) are padded with identity rows so
    log(eigenvalue)=0 contributes nothing.
    """
    k, m = alphas.shape

    def one_probe(a, bt, nrm2):
        safe_a = jnp.where(a > 0, a, 1.0)
        active = a > 0
        diag = 1.0 / safe_a
        diag = diag.at[1:].add(jnp.where(active[:-1], bt[:-1] / safe_a[:-1], 0.0))
        off = jnp.where(active[:-1], jnp.sqrt(jnp.maximum(bt[:-1], 0.0)) / safe_a[:-1], 0.0)
        diag = jnp.where(active, diag, 1.0)  # identity padding
        t = jnp.diag(diag) + jnp.diag(off, 1) + jnp.diag(off, -1)
        evals, evecs = jnp.linalg.eigh(t)
        w = evecs[0, :] ** 2
        return nrm2 * jnp.sum(w * jnp.log(jnp.maximum(evals, 1e-30)))

    vals = jax.vmap(one_probe, in_axes=(1, 1, 0))(alphas, betas, b2)
    return jnp.mean(vals)


def make_cg_nlml(kernel: str, probes: int = 16, max_iters: int = 32,
                 row_panel: int = 4096, col_panel: int = 4096,
                 precision: str = "high"):
    """Returns ``nlml(params, x, y, key)``: matrix-free value + gradient.

    The value's logdet term and the gradient's trace term are stochastic
    (probes); the quad term is exact up to CG tolerance. Pass a fresh key per
    step. Differentiable w.r.t. params and y.
    """

    def solves(params, x, y, key):
        n = x.shape[0]
        noise = jnp.exp(params["log_noise_variance"])
        jitter = linalg.default_jitter(x.dtype) * jnp.exp(params["log_variance"])
        total_noise = noise + jitter
        z = jax.random.rademacher(key, (n, probes), dtype=x.dtype)
        b = jnp.concatenate([y[:, None], z], axis=1)
        mv = lambda v: kmv(kernel, params, x, v, total_noise, row_panel,
                           precision)
        sol, alphas, betas = mbcg(mv, b, max_iters=max_iters)
        alpha_y = sol[:, 0]
        w = sol[:, 1:]
        b2 = jnp.sum(z * z, axis=0)
        logdet = _slq_logdet_from_coeffs(alphas[:, 1:], betas[:, 1:], b2, n)
        return alpha_y, w, z, logdet

    def value(params, x, y, key):
        n = x.shape[0]
        alpha_y, _, _, logdet = solves(params, x, y, key)
        quad = 0.5 * jnp.vdot(y, alpha_y)
        return quad + 0.5 * logdet + 0.5 * n * math.log(2.0 * math.pi)

    @jax.custom_vjp
    def nlml(params, x, y, key):
        return value(params, x, y, key)

    def fwd(params, x, y, key):
        n = x.shape[0]
        alpha_y, w, z, logdet = solves(params, x, y, key)
        quad = 0.5 * jnp.vdot(y, alpha_y)
        out = quad + 0.5 * logdet + 0.5 * n * math.log(2.0 * math.pi)
        return out, (params, x, alpha_y, w, z)

    def bwd(res, g):
        params, x, alpha, w, z = res
        n = x.shape[0]
        r = _fit_panel(n, col_panel)
        n_panels = n // r
        inv_m = 1.0 / probes

        def panel_step(j, carry):
            grads_acc, diag_acc = carry
            c0 = j * r
            x_cols = jax.lax.dynamic_slice_in_dim(x, c0, r, axis=0)
            z_cols = jax.lax.dynamic_slice_in_dim(z, c0, r, axis=0)
            a_cols = jax.lax.dynamic_slice_in_dim(alpha, c0, r, axis=0)
            kbar = 0.5 * g * (inv_m * (w @ z_cols.T)
                              - alpha[:, None] * a_cols[None, :])
            idx = jnp.arange(r)
            diag_acc = diag_acc + jnp.sum(kbar[c0 + idx, idx])
            _, pullback = jax.vjp(
                lambda pp: K.gram(kernel, pp, x, x_cols), params)
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


def make_cg_training_loss(kernel: str, probes: int = 16, max_iters: int = 32,
                          **kwargs):
    nlml = make_cg_nlml(kernel, probes, max_iters, **kwargs)

    def loss(params, x, y, key):
        return nlml(params, x, y, key) - log_prior(params)

    return loss


def kmv_cross(kernel: str, params: dict[str, Array], x1: Array, x2: Array,
              v: Array, row_panel: int = 4096,
              precision: str = "high") -> Array:
    """k(x1, x2) @ v streamed over row panels of x1 (never stores the cross
    Gram). v: (N2, R) -> (N1, R)."""
    n1 = x1.shape[0]
    if n1 >= 2048 and kernel in K.STATIONARY_KERNELS and \
            jax.devices()[0].platform == "tpu":
        from gpras_tpu.ops.pallas_gram import pallas_kmv

        return pallas_kmv(kernel, params, x1, v, x2=x2)
    p = _fit_panel(n1, row_panel)

    def body(j, out):
        r0 = j * p
        rows = jax.lax.dynamic_slice_in_dim(x1, r0, p, axis=0)
        tile = K.gram(kernel, params, rows, x2)
        upd = jnp.matmul(tile, v, precision=precision,
                         preferred_element_type=v.dtype)
        return jax.lax.dynamic_update_slice_in_dim(out, upd, r0, axis=0)

    out = jnp.zeros((n1,) + v.shape[1:], v.dtype)
    return jax.lax.fori_loop(0, n1 // p, body, out)


def cg_posterior_alpha(kernel: str, params: dict[str, Array], x: Array,
                       y: Array, max_iters: int = 64,
                       row_panel: int = 4096) -> Array:
    """alpha = (K + noise I)^{-1} y via batched CG (matrix-free)."""
    noise = jnp.exp(params["log_noise_variance"]) + \
        linalg.default_jitter(x.dtype) * jnp.exp(params["log_variance"])
    mv = lambda v: kmv(kernel, params, x, v, noise, row_panel)
    y2 = y[:, None] if y.ndim == 1 else y
    sol, _, _ = mbcg(mv, y2, max_iters=max_iters)
    return sol[:, 0] if y.ndim == 1 else sol


def cg_predict(kernel: str, params: dict[str, Array], x: Array, y: Array,
               x_test: Array, alpha: Array | None = None,
               max_iters: int = 64, row_panel: int = 4096,
               var_chunk: int = 256) -> tuple[Array, Array]:
    """Matrix-free posterior (mean, variance) of y* at x_test.

    mean = k(x*, X) alpha;  var_i = k(x*_i,x*_i) − k_i* K^{-1} k_i*^T + noise,
    with the per-test-point solves batched ``var_chunk`` columns at a time
    (each chunk is one batched-CG run; memory O(N * var_chunk)). The exact
    posterior of the dense engine, evaluated without ever forming K.
    """
    if alpha is None:
        alpha = cg_posterior_alpha(kernel, params, x, y, max_iters, row_panel)
    mean = kmv_cross(kernel, params, x_test, x, alpha[:, None],
                     row_panel)[:, 0]
    noise = jnp.exp(params["log_noise_variance"]) + \
        linalg.default_jitter(x.dtype) * jnp.exp(params["log_variance"])
    mv = lambda v: kmv(kernel, params, x, v, noise, row_panel)
    s = x_test.shape[0]
    c = _fit_panel(s, var_chunk)

    def chunk(j, var_out):
        c0 = j * c
        xq = jax.lax.dynamic_slice_in_dim(x_test, c0, c, axis=0)
        ks = K.gram(kernel, params, x, xq)  # (N, c) tile
        sol, _, _ = mbcg(mv, ks, max_iters=max_iters)
        quad = jnp.sum(ks * sol, axis=0)
        return jax.lax.dynamic_update_slice_in_dim(var_out, quad, c0, axis=0)

    quad_all = jax.lax.fori_loop(0, s // c, chunk, jnp.zeros((s,), x.dtype))
    var = K.kdiag(kernel, params, x_test) - quad_all
    var = jnp.maximum(var, 0.0) + jnp.exp(params["log_noise_variance"])
    return mean, var
