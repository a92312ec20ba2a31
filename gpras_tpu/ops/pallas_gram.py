"""Tiled Pallas Gram-matrix kernel for stationary covariances on TPU.

The Gram build is the framework's hottest memory-bound op: for N training
points it writes an (N, N) matrix whose per-element compute is tiny (one D-dim
dot + a handful of transcendentals). The XLA path materializes the scaled
squared-distance matrix and the kernel output as separate fusions; this Pallas
kernel fuses everything — scaled matmul, row/col norms, distance assembly,
covariance elementwise tail, and the noise diagonal — into one pass over VMEM
tiles, so each K tile is written exactly once to HBM.

Layout: grid (N1/TM, N2/TN); each program loads an (TM, D) and a (TN, D) slice
of the pre-scaled inputs (scaling by the ARD lengthscales is done outside — an
O(N D) op), computes the tile on the MXU + VPU, and stores (TM, TN).

Falls back to the pure-JAX builder (gpras_tpu.ops.kernels) off-TPU, for
non-stationary kernels, or for shapes below the tile size.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from gpras_tpu.ops import kernels as KK

Array = jax.Array

TILE_M = 256
TILE_N = 256


def _tile_body(kernel: str, a_ref, b_ref, var_ref, noise_ref, out_ref,
               tile_m: int, tile_n: int, square: bool):
    from jax.experimental import pallas as pl

    a = a_ref[:]  # (TM, D) pre-scaled rows
    b = b_ref[:]  # (TN, D) pre-scaled cols
    ab = jax.lax.dot_general(a, b, dimension_numbers=(((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    a2 = jnp.sum(a * a, axis=1, keepdims=True)       # (TM, 1)
    b2 = jnp.sum(b * b, axis=1, keepdims=True).T     # (1, TN)
    r2 = jnp.maximum(a2 + b2 - 2.0 * ab, 0.0)
    variance = var_ref[0, 0]
    if kernel == "RBF":
        k = variance * jnp.exp(-0.5 * r2)
    else:
        r = jnp.sqrt(jnp.maximum(r2, 1e-36))
        if kernel == "Matern12":
            k = variance * jnp.exp(-r)
        elif kernel == "Matern32":
            s3r = math.sqrt(3.0) * r
            k = variance * (1.0 + s3r) * jnp.exp(-s3r)
        elif kernel == "Matern52":
            s5r = math.sqrt(5.0) * r
            k = variance * (1.0 + s5r + (5.0 / 3.0) * r2) * jnp.exp(-s5r)
        elif kernel == "Exponential":
            k = variance * jnp.exp(-0.5 * r)
        else:
            raise ValueError(kernel)
    if square:
        # fused noise/jitter diagonal: global element ids
        i = pl.program_id(0)
        j = pl.program_id(1)
        rows = i * tile_m + jax.lax.broadcasted_iota(jnp.int32, (tile_m, tile_n), 0)
        cols = j * tile_n + jax.lax.broadcasted_iota(jnp.int32, (tile_m, tile_n), 1)
        k = jnp.where(rows == cols, k + noise_ref[0, 0], k)
    out_ref[:] = k.astype(out_ref.dtype)


def _pad_rows(x: Array, mult: int) -> Array:
    n = x.shape[0]
    pad = (-n) % mult
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, x.shape[1]), x.dtype)], axis=0)
    return x


@partial(jax.jit, static_argnums=(0,))
def pallas_gram(kernel: str, params: dict[str, Array], x1: Array,
                x2: Array | None = None, noise: Array | None = None) -> Array:
    """Fused stationary Gram on TPU; adds ``noise`` on the diagonal when square.

    Shapes are padded up to the tile size and cropped after — padded rows
    produce garbage columns that are sliced away (they never pollute real
    entries because each output element depends only on its own row/col pair).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if kernel not in KK.STATIONARY_KERNELS:
        raise ValueError(f"pallas_gram supports stationary kernels, got {kernel}")
    square = x2 is None
    if x2 is None:
        x2 = x1
    n1, d = x1.shape
    n2 = x2.shape[0]
    ls = jnp.exp(params["log_lengthscales"]).astype(jnp.float32)
    a = (x1.astype(jnp.float32) / ls)
    b = (x2.astype(jnp.float32) / ls)
    a = _pad_rows(a, TILE_M)
    b = _pad_rows(b, TILE_N)
    m_p, n_p = a.shape[0], b.shape[0]
    var = jnp.exp(params["log_variance"]).astype(jnp.float32).reshape(1, 1)
    nz = (jnp.zeros((), jnp.float32) if noise is None
          else jnp.asarray(noise, jnp.float32)).reshape(1, 1)

    out = pl.pallas_call(
        partial(_tile_body, kernel, tile_m=TILE_M, tile_n=TILE_N, square=square),
        grid=(m_p // TILE_M, n_p // TILE_N),
        in_specs=[
            pl.BlockSpec((TILE_M, d), lambda i, j: (i, 0)),
            pl.BlockSpec((TILE_N, d), lambda i, j: (j, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((TILE_M, TILE_N), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m_p, n_p), jnp.float32),
    )(a, b, var, nz)
    return out[:n1, :n2]


def gram(kernel: str, params: dict[str, Array], x1: Array,
         x2: Array | None = None, noise: Array | None = None) -> Array:
    """Pallas when possible (TPU + stationary + big enough), else pure JAX."""
    on_tpu = jax.devices()[0].platform == "tpu"
    big = x1.shape[0] >= TILE_M and (x2 is None or x2.shape[0] >= TILE_N)
    if on_tpu and big and kernel in KK.STATIONARY_KERNELS:
        return pallas_gram(kernel, params, x1, x2, noise)
    k = KK.gram(kernel, params, x1, x2)
    if noise is not None and x2 is None:
        k = k + jnp.asarray(noise, k.dtype) * jnp.eye(x1.shape[0], dtype=k.dtype)
    return k
