"""Dense linear-algebra helpers for the GP core: Cholesky with jitter, solves.

Replaces the TF ops the reference delegated to via GPflow (reference gpras/gpr.py:299,
SGPR internals): Cholesky factorization, triangular solves, and log-determinants.
On TPU these lower to XLA's blocked MXU implementations; a Pallas blocked
right-looking Cholesky for very large N lives in ``gpras_tpu.ops.block_cholesky``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

#: Default diagonal jitter, scaled to the working dtype. The reference runs float64
#: with GPflow's 1e-6 default jitter (gpflow default_jitter); in float32 on TPU we
#: use a larger floor and adaptive escalation.
DEFAULT_JITTER_F32 = 1e-6
DEFAULT_JITTER_F64 = 1e-9


def default_jitter(dtype) -> float:
    return DEFAULT_JITTER_F64 if jnp.dtype(dtype) == jnp.float64 else DEFAULT_JITTER_F32


def add_jitter(k: Array, jitter: float | Array | None = None) -> Array:
    """K + jitter * mean(diag(K)) * I — relative jitter keeps scale-invariance."""
    if jitter is None:
        jitter = default_jitter(k.dtype)
    scale = jnp.mean(jnp.diag(k))
    return k + (jitter * scale) * jnp.eye(k.shape[-1], dtype=k.dtype)


def cholesky(k: Array, jitter: float | None = None) -> Array:
    """Lower Cholesky factor of K + jitter*I (relative jitter)."""
    return jnp.linalg.cholesky(add_jitter(k, jitter))


def safe_cholesky(k: Array, max_tries: int = 5, jitter: float | None = None) -> Array:
    """Cholesky with adaptive jitter escalation (x10 per retry), fully jittable.

    Uses ``lax.while_loop`` so the escalation compiles to a single program: retry
    while the factor contains NaNs (XLA returns NaN rather than raising on an
    indefinite matrix) and tries remain.
    """
    if jitter is None:
        jitter = default_jitter(k.dtype)
    scale = jnp.mean(jnp.diag(k))
    eye = jnp.eye(k.shape[-1], dtype=k.dtype)

    def attempt(j):
        return jnp.linalg.cholesky(k + (j * scale) * eye)

    def cond(state):
        i, _, l = state
        return jnp.logical_and(i < max_tries, jnp.any(jnp.isnan(l)))

    def body(state):
        i, j, _ = state
        j = j * 10.0
        return i + 1, j, attempt(j)

    j0 = jnp.asarray(jitter, dtype=k.dtype)
    _, _, l = jax.lax.while_loop(cond, body, (0, j0, attempt(j0)))
    return l


def solve_triangular(l: Array, b: Array, *, lower: bool = True, trans: bool = False) -> Array:
    """Triangular solve; thin wrapper so call sites read like the math."""
    return jax.scipy.linalg.solve_triangular(l, b, lower=lower, trans=1 if trans else 0)


def cho_solve(l: Array, b: Array) -> Array:
    """Solve (L L^T) x = b given the lower factor L."""
    y = solve_triangular(l, b, lower=True)
    return solve_triangular(l, y, lower=True, trans=True)


def logdet_from_chol(l: Array) -> Array:
    """log det(K) = 2 * sum(log diag(L))."""
    return 2.0 * jnp.sum(jnp.log(jnp.diagonal(l, axis1=-2, axis2=-1)), axis=-1)


def inv_from_chol(l: Array) -> Array:
    """K^{-1} from the lower factor L (used by the custom-VJP NLML backward)."""
    eye = jnp.eye(l.shape[-1], dtype=l.dtype)
    linv = solve_triangular(l, eye, lower=True)
    return linv.T @ linv
