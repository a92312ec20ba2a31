"""In-place blocked right-looking Cholesky as a fori_loop (single-device).

Why not ``jnp.linalg.cholesky``? Two reasons at very large N on this stack:

1. **Memory**: XLA's cholesky consumes K and produces L as separate O(N^2)
   buffers; at N = 50k f32 that is 2 x 10 GB before anything else. Here the
   loop carry *is* the matrix — XLA's while-loop carry aliasing updates it in
   place, so the factorization runs in one buffer.
2. **Compile time**: the native cholesky lowering's cost grows with N (tens of
   minutes through this environment's remote compiler at N >= 16k). This loop
   body is O(1) ops regardless of N — compile cost is flat.

Algorithm per panel kb (width b): factorize the b x b diagonal block
(``jnp.linalg.cholesky`` on the small block), TRSM the full panel column, then
one full-width masked rank-b update ``K -= col col^T`` (rows/columns left of the
panel are masked to zero so already-finished entries are untouched). The masked
full-width update costs ~3x the minimal trailing FLOPs in exchange for a single
fused MXU matmul per step — the same static-shape tradeoff as the distributed
version (parallel/pcholesky.py), whose per-device body this mirrors.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

Array = jax.Array


def _i32(v):
    return jnp.asarray(v, jnp.int32)


@partial(jax.jit, static_argnums=(1,))
def blocked_cholesky(k: Array, b: int = 512) -> Array:
    """Lower Cholesky factor of SPD ``k`` (N, N); N must be divisible by b."""
    n = k.shape[0]
    if n % b != 0:
        raise ValueError(f"N={n} must be divisible by block size {b}")
    nb = n // b
    gidx = jnp.arange(n)

    def step(kb, kmat):
        g0 = kb * b
        a_kk = jax.lax.dynamic_slice(kmat, (_i32(g0), _i32(g0)), (b, b))
        l_kk = jnp.linalg.cholesky(a_kk)
        col = jax.lax.dynamic_slice(kmat, (_i32(0), _i32(g0)), (n, b))
        l_col = jax.scipy.linalg.solve_triangular(l_kk, col.T, lower=True).T
        below = (gidx >= g0 + b)[:, None]
        in_panel = ((gidx >= g0) & (gidx < g0 + b))[:, None]
        l_kk_rows = jax.lax.dynamic_update_slice(
            jnp.zeros((n, b), kmat.dtype), l_kk, (_i32(g0), _i32(0)))
        new_col = jnp.where(below, l_col, jnp.where(in_panel, l_kk_rows, col))
        kmat = jax.lax.dynamic_update_slice(kmat, new_col, (_i32(0), _i32(g0)))
        col_masked = jnp.where(below, new_col, 0.0)
        return kmat - jnp.matmul(col_masked, col_masked.T,
                                 preferred_element_type=kmat.dtype)

    k_done = jax.lax.fori_loop(0, nb, step, k)
    return jnp.tril(k_done)


@partial(jax.jit, static_argnums=(2,))
def blocked_solve_lower(l: Array, rhs: Array, b: int = 512) -> Array:
    """Forward substitution L y = rhs with the same flat-compile structure:
    a fori_loop whose body solves one b-row panel and applies one masked
    full-width correction."""
    n = l.shape[0]
    if n % b != 0:
        raise ValueError(f"N={n} must be divisible by block size {b}")
    nb = n // b
    m = rhs.shape[1]
    cols = jnp.arange(n)

    def step(kb, y):
        g0 = kb * b
        panel = jax.lax.dynamic_slice(l, (_i32(g0), _i32(0)), (b, n))
        l_kk = jax.lax.dynamic_slice(panel, (_i32(0), _i32(g0)), (b, b))
        panel_left = jnp.where(cols[None, :] < g0, panel, 0.0)
        rhs_panel = jax.lax.dynamic_slice(rhs, (_i32(g0), _i32(0)), (b, m))
        corr = panel_left @ y
        y_kb = jax.scipy.linalg.solve_triangular(l_kk, rhs_panel - corr,
                                                 lower=True)
        return jax.lax.dynamic_update_slice(y, y_kb, (_i32(g0), _i32(0)))

    return jax.lax.fori_loop(0, nb, step, jnp.zeros_like(rhs))


@partial(jax.jit, static_argnums=(2,))
def blocked_solve_upper(l: Array, rhs: Array, b: int = 512) -> Array:
    """Backward substitution L^T x = rhs (bottom-up panels)."""
    n = l.shape[0]
    if n % b != 0:
        raise ValueError(f"N={n} must be divisible by block size {b}")
    nb = n // b
    m = rhs.shape[1]
    rows = jnp.arange(n)

    def step(t, x):
        kb = nb - 1 - t
        g0 = kb * b
        col = jax.lax.dynamic_slice(l, (_i32(0), _i32(g0)), (n, b))
        l_kk = jax.lax.dynamic_slice(col, (_i32(g0), _i32(0)), (b, b))
        col_below = jnp.where((rows >= g0 + b)[:, None], col, 0.0)
        corr = col_below.T @ x
        rhs_panel = jax.lax.dynamic_slice(rhs, (_i32(g0), _i32(0)), (b, m))
        x_kb = jax.scipy.linalg.solve_triangular(l_kk, rhs_panel - corr,
                                                 lower=True, trans=1)
        return jax.lax.dynamic_update_slice(x, x_kb, (_i32(g0), _i32(0)))

    return jax.lax.fori_loop(0, nb, step, jnp.zeros_like(rhs))


def blocked_cho_solve(l: Array, rhs: Array, b: int = 512) -> Array:
    """(L L^T)^{-1} rhs using the flat-compile panel solves."""
    rhs2 = rhs[:, None] if rhs.ndim == 1 else rhs
    y = blocked_solve_lower(l, rhs2, b)
    x = blocked_solve_upper(l, y, b)
    return x[:, 0] if rhs.ndim == 1 else x
