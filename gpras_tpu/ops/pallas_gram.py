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


def _tile_value(kernel: str, a, b, variance, noise,
                tile_m: int, tile_n: int, square: bool):
    """Covariance tile k(a, b) from pre-scaled coordinate blocks (in VMEM)."""
    from jax.experimental import pallas as pl

    # explicit precision: Mosaic rejects the package-level 'high' default
    # (HIGHEST = full f32 passes; the contraction dim is only D, so free)
    ab = jax.lax.dot_general(a, b, dimension_numbers=(((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
    a2 = jnp.sum(a * a, axis=1, keepdims=True)       # (TM, 1)
    b2 = jnp.sum(b * b, axis=1, keepdims=True).T     # (1, TN)
    r2 = jnp.maximum(a2 + b2 - 2.0 * ab, 0.0)
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
        # fused noise/jitter diagonal via broadcast 1-D iotas (two full
        # (tile_m, tile_n) i32 iotas cost 8 MB of scoped VMEM at 1024² —
        # see _kmv_sym_body's note): rows==cols ⇔ r - c == j*tn - i*tm
        i = pl.program_id(0)
        j = pl.program_id(1)
        r1 = jax.lax.broadcasted_iota(jnp.int32, (tile_m, 1), 0)
        c1 = jax.lax.broadcasted_iota(jnp.int32, (1, tile_n), 1)
        k = k + noise * (r1 == c1 + (j * tile_n - i * tile_m)).astype(
            jnp.float32)
    return k


def _tile_body(kernel: str, a_ref, b_ref, var_ref, noise_ref, out_ref,
               tile_m: int, tile_n: int, square: bool):
    k = _tile_value(kernel, a_ref[:], b_ref[:], var_ref[0, 0], noise_ref[0, 0],
                    tile_m, tile_n, square)
    out_ref[:] = k.astype(out_ref.dtype)


def _kmv_body(kernel: str, a_ref, b_ref, v_ref, var_ref, noise_ref, out_ref,
              tile_m: int, tile_n: int, square: bool, sub: int = 256):
    """One (TM, TN) covariance tile contracted with its V block, accumulated
    into the row-tile output — the tile lives only in VMEM.

    The tile is processed in ``sub``-column chunks: chunk c+1's covariance
    evaluation (VPU transcendentals — the dominant cost) carries no data
    dependence on chunk c's contraction (MXU), exposing the overlap
    opportunity to Mosaic's scheduler. Measured honestly at N=131,072,
    R=128 (round 3): IN-GRAPH (inside the CG fori_loop, the production
    context) the chunked and monolithic bodies both run ~225 ms/pass — the
    serial VPU+MXU roofline; Mosaic does not currently exploit the ILP.
    (A standalone-dispatch microbench suggested 2.4x, but that contrast was
    relay-dispatch noise — per-dispatch overhead at this size is ~1.2 s,
    5x the kernel itself. Results identical to 3e-7 either way; the
    chunked structure is kept as it costs nothing and lets a future Mosaic
    scheduler take the overlap.)"""
    from jax.experimental import pallas as pl

    a = a_ref[:]
    v = v_ref[:]
    var = var_ref[0, 0]
    noise = noise_ref[0, 0]
    i = pl.program_id(0)
    j = pl.program_id(1)

    # Manual bf16_3x contraction: Mosaic only exposes DEFAULT (1 bf16 pass —
    # caps CG's reachable residual at ~1e-2) and HIGHEST (~6 passes). The
    # hi/lo split a.b ~= ah.bh + ah.bl + al.bh gives f32-grade accumulation
    # in 3 native MXU passes (dropped lo.lo term ~ 2^-16 relative), the same
    # tradeoff as XLA's 'high' everywhere else in the framework.
    def bdot(aa, bb):
        return jnp.dot(aa, bb, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.DEFAULT)

    sub = min(sub, tile_n)
    contrib = jnp.zeros((tile_m, v.shape[1]), jnp.float32)
    # range/min over static shapes: a trailing partial chunk (tile_n not a
    # multiple of sub) is handled with its own static width — every column
    # of the tile is contracted exactly once
    for c0 in range(0, tile_n, sub):
        cw = min(sub, tile_n - c0)
        b_sub = b_ref[c0:c0 + cw, :]
        k = _tile_value(kernel, a, b_sub, var, 0.0, tile_m, cw, False)
        if square:
            # diagonal indicator from broadcast 1-D iotas (not two full
            # (tile_m, cw) i32 iotas — see _kmv_sym_body's scoped-VMEM note)
            r1 = jax.lax.broadcasted_iota(jnp.int32, (tile_m, 1), 0)
            c1 = jax.lax.broadcasted_iota(jnp.int32, (1, cw), 1)
            off = j * tile_n + c0 - i * tile_m
            k = k + noise * (r1 == c1 + off).astype(jnp.float32)
        v_sub = v[c0:c0 + cw, :]
        k_hi = k.astype(jnp.bfloat16)
        k_lo = (k - k_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        v_hi = v_sub.astype(jnp.bfloat16)
        v_lo = (v_sub - v_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        contrib = contrib + bdot(k_hi, v_hi) + bdot(k_hi, v_lo) \
            + bdot(k_lo, v_hi)

    @pl.when(j == 0)
    def _init():
        out_ref[:] = contrib.astype(out_ref.dtype)

    @pl.when(j > 0)
    def _acc():
        out_ref[:] = (out_ref[:] + contrib).astype(out_ref.dtype)


def _kmv_sym_body(kernel: str, a_ref, b_ref, vj_ref, vi_ref, var_ref,
                  noise_ref, cacc_in_ref, row_ref, cacc_ref,
                  tile: int, sub: int = 1024, i_off: int = 0,
                  nb_desc: int = 0):
    """Upper-triangle step of the SYMMETRIC fused matvec.

    The Gram matrix is symmetric, and the covariance-tile build (VPU
    transcendentals) dominates the fused matvec, so each strictly-upper tile
    K_ij (j > i) is evaluated ONCE and contracted twice:

        row[i]  += K_ij @ v[j]        (the dense kernel's contribution)
        cacc[j] += K_ij^T @ v[i]      (the mirrored lower-triangle one)

    ``row`` accumulates in VMEM across the inner-j sweep exactly like
    ``_kmv_body`` (block index (i,) is constant over the row, flushed once).
    ``cacc``'s block index (j,) changes EVERY grid step, so it accumulates
    through an HBM read-modify-write: ``cacc_in`` is the same buffer aliased
    as an input (pallas_call input_output_aliases). Race-safety: block j is
    touched exactly once per block-row, i.e. successive writes/reads of the
    same block are a full inner sweep (NB grid steps) apart — far beyond the
    DMA pipeline's lookahead. Lower-triangle steps (j < i) skip the tile and
    pass ``cacc`` through unchanged (the per-step flush always needs a
    defined value).

    NOTE the HBM read-modify-write requires COMPILED pallas:
    jax's interpret mode keeps aliased input/output carries in separate
    buffers (hlo_interpreter TODO b/370563936), so ``cacc_in`` reads stale
    zeros there. ``pallas_kmv`` therefore routes ``interpret=True`` through
    the sequential per-block-row launcher (``i_off``: one call per block
    row, grid (1, nb), cacc threaded functionally between calls — same body,
    same per-tile math, no aliasing) which is also the CPU reference the
    compiled path is tested against.
    """
    from jax.experimental import pallas as pl

    # nb_desc > 0: block rows are processed DESCENDING (physical row
    # nb-1-pid) and the j-indexed operands (b, v_j, cacc) use clamped block
    # maps max(i, j) — lower-triangle steps re-touch the row's own block, so
    # they cost no DMA at all, and a cacc block's successive HBM touches are
    # always >= nb-2 grid steps apart (every earlier-processed row only
    # touches blocks >= its own index, which is > this row's).
    if nb_desc:
        i = nb_desc - 1 - pl.program_id(0)
    else:
        i = pl.program_id(0) + i_off
    j = pl.program_id(1)

    @pl.when(j < i)
    def _skip():
        cacc_ref[:] = cacc_in_ref[:]

    @pl.when(j >= i)
    def _compute():
        a = a_ref[:]
        vj = vj_ref[:]
        var = var_ref[0, 0]
        noise = noise_ref[0, 0]

        def bdot(aa, bb, dims):
            return jax.lax.dot_general(aa, bb, dimension_numbers=dims,
                                       preferred_element_type=jnp.float32,
                                       precision=jax.lax.Precision.DEFAULT)

        row_dims = (((1,), (0,)), ((), ()))   # (T, cw) @ (cw, R)
        col_dims = (((0,), (0,)), ((), ()))   # (T, cw)^T @ (T, R)
        vi = vi_ref[:]
        vi_hi = vi.astype(jnp.bfloat16)
        vi_lo = (vi - vi_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        # strictly-upper tiles mirror into cacc[j]; the diagonal tile (its
        # own mirror) contributes to row[i] only — mask by the 0/1 scalar
        mirror = (j > i).astype(jnp.float32)

        contrib = jnp.zeros((tile, vj.shape[1]), jnp.float32)
        for c0 in range(0, tile, sub):
            cw = min(sub, tile - c0)
            b_sub = b_ref[c0:c0 + cw, :]
            k = _tile_value(kernel, a, b_sub, var, 0.0, tile, cw, False)
            # global ids coincide only inside the diagonal tile (i == j):
            # rows==cols ⇔ r - c == (j - i)*tile + c0. Build the indicator
            # from broadcast 1-D iotas — two full (tile, cw) i32 iotas cost
            # ~8 MB of scoped VMEM at sub=1024, which is what pushed
            # Mosaic's 16 MB stack over by 976 KB at nb >= 128 and forced
            # the slower sub=512 config (round-4 fix).
            r1 = jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
            c1 = jax.lax.broadcasted_iota(jnp.int32, (1, cw), 1)
            off = (j - i) * tile + c0
            k = k + noise * (r1 == c1 + off).astype(jnp.float32)
            # bf16_3x split of the tile, shared by both contractions
            k_hi = k.astype(jnp.bfloat16)
            k_lo = (k - k_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            v_sub = vj[c0:c0 + cw, :]
            v_hi = v_sub.astype(jnp.bfloat16)
            v_lo = (v_sub - v_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            contrib = contrib + bdot(k_hi, v_hi, row_dims) \
                + bdot(k_hi, v_lo, row_dims) + bdot(k_lo, v_hi, row_dims)
            cc = bdot(k_hi, vi_hi, col_dims) + bdot(k_hi, vi_lo, col_dims) \
                + bdot(k_lo, vi_hi, col_dims)
            cacc_ref[c0:c0 + cw, :] = cacc_in_ref[c0:c0 + cw, :] + mirror * cc

        @pl.when(j == i)
        def _init():
            row_ref[:] = contrib.astype(row_ref.dtype)

        @pl.when(j > i)
        def _acc():
            row_ref[:] = (row_ref[:] + contrib).astype(row_ref.dtype)


def _pad_rows(x: Array, mult: int) -> Array:
    n = x.shape[0]
    pad = (-n) % mult
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, x.shape[1]), x.dtype)], axis=0)
    return x


@partial(jax.jit, static_argnums=(0, 5))
def pallas_gram(kernel: str, params: dict[str, Array], x1: Array,
                x2: Array | None = None, noise: Array | None = None,
                interpret: bool = False) -> Array:
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
        interpret=interpret,
    )(a, b, var, nz)
    return out[:n1, :n2]


def gram(kernel: str, params: dict[str, Array], x1: Array,
         x2: Array | None = None, noise: Array | None = None) -> Array:
    """Pallas when possible (TPU + stationary + big enough), else pure JAX."""
    on_tpu = jax.devices()[0].platform == "tpu"
    big = x1.shape[0] >= TILE_M and (x2 is None or x2.shape[0] >= TILE_N)
    # the pallas kernel computes in f32; never silently downcast f64 inputs
    if on_tpu and big and kernel in KK.STATIONARY_KERNELS \
            and x1.dtype == jnp.float32:
        return pallas_gram(kernel, params, x1, x2, noise)
    k = KK.gram(kernel, params, x1, x2)
    if noise is not None and x2 is None:
        k = k + jnp.asarray(noise, k.dtype) * jnp.eye(x1.shape[0], dtype=k.dtype)
    return k


def pallas_kmv(kernel: str, params: dict[str, Array], x1: Array,
               v: Array, x2: Array | None = None,
               noise: Array | None = None, interpret: bool = False,
               tile_m: int = 1024, tile_n: int = 1024,
               sym: bool | None = None, sub: int | None = None) -> Array:
    """Fused (K(x1, x2) + noise I) @ v — the covariance tile never leaves VMEM.

    The matrix-free CG engine's matvec (gp/exact_cg.py) is bandwidth-bound
    when the (panel, N) Gram tile round-trips HBM (XLA cannot fuse a producer
    into a dot operand). Here each (TM, TN) tile is built and contracted with
    its (TN, R) V-block in registers/VMEM, so HBM traffic per matvec drops
    from O(N^2) to O(N * (D + R)) — pure compute.

    v: (N2, R). Returns (N1, R) f32. ``noise`` is added on the diagonal only
    when x2 is None (square). R is padded to the lane width internally.

    ``sym`` (auto when square with >= 8 tile rows): exploit K's symmetry by
    evaluating only upper-triangle covariance tiles and contracting each
    twice (``_kmv_sym_body``) — ~2x less transcendental work, which is the
    measured roofline of the square matvec. Bit-identical contraction order
    per tile; the row/mirror partial sums add in a different order than the
    dense sweep, so results match to f32 rounding, not bitwise.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if kernel not in KK.STATIONARY_KERNELS:
        raise ValueError(f"pallas_kmv supports stationary kernels, got {kernel}")
    square = x2 is None
    if x2 is None:
        x2 = x1
    n1 = x1.shape[0]
    n2, r = x2.shape[0], v.shape[1]
    ls = jnp.exp(params["log_lengthscales"]).astype(jnp.float32)
    a = _pad_rows(x1.astype(jnp.float32) / ls, tile_m)
    b = _pad_rows(x2.astype(jnp.float32) / ls, tile_n)
    # padded V rows are zero => padded Gram columns contribute nothing
    v_p = _pad_rows(v.astype(jnp.float32), tile_n)
    r_pad = (-r) % 128
    if r_pad:
        v_p = jnp.concatenate(
            [v_p, jnp.zeros((v_p.shape[0], r_pad), jnp.float32)], axis=1)
    m_p, n_p = a.shape[0], b.shape[0]
    var = jnp.exp(params["log_variance"]).astype(jnp.float32).reshape(1, 1)
    nz = (jnp.zeros((), jnp.float32) if noise is None
          else jnp.asarray(noise, jnp.float32)).reshape(1, 1)

    sub_req = sub
    if sym is None:
        sym = square and tile_m == tile_n and (m_p // tile_m) >= 8
    if sym:
        if not (square and tile_m == tile_n):
            raise ValueError("sym=True requires a square Gram and equal tiles")
        nb = m_p // tile_m
        rw = v_p.shape[1]
        if interpret:
            # interpret mode cannot express the aliased HBM read-modify-write
            # (see _kmv_sym_body) — run one call per block row, threading the
            # mirror accumulator functionally. Same body, same per-tile math.
            cacc = jnp.zeros((m_p, rw), jnp.float32)
            rows = []
            for i0 in range(nb):
                row_i, cacc = pl.pallas_call(
                    partial(_kmv_sym_body, kernel, tile=tile_m, i_off=i0),
                    grid=(1, nb),
                    in_specs=[
                        pl.BlockSpec((tile_m, a.shape[1]),
                                     lambda i, j, i0=i0: (i0, 0)),
                        pl.BlockSpec((tile_m, b.shape[1]), lambda i, j: (j, 0)),
                        pl.BlockSpec((tile_m, rw), lambda i, j: (j, 0)),
                        pl.BlockSpec((tile_m, rw), lambda i, j, i0=i0: (i0, 0)),
                        pl.BlockSpec(memory_space=pltpu.SMEM),
                        pl.BlockSpec(memory_space=pltpu.SMEM),
                        pl.BlockSpec((tile_m, rw), lambda i, j: (j, 0)),
                    ],
                    out_specs=[
                        pl.BlockSpec((tile_m, rw), lambda i, j: (0, 0)),
                        pl.BlockSpec((tile_m, rw), lambda i, j: (j, 0)),
                    ],
                    out_shape=[
                        jax.ShapeDtypeStruct((tile_m, rw), jnp.float32),
                        jax.ShapeDtypeStruct((m_p, rw), jnp.float32),
                    ],
                    interpret=True,
                )(a, b, v_p, v_p, var, nz, cacc)
                rows.append(row_i)
            return (jnp.concatenate(rows, axis=0) + cacc)[:n1, :r]
        # sub-tile width of the covariance chunk (the scoped-VMEM driver:
        # the (tile, sub) f32 covariance tile, its elementwise temporaries,
        # and the bf16 hi/lo splits — ~17 MB at sub=1024, ~8.5 MB at 512).
        # sub=1024 is the measured-fast config (round-4 same-session sweep
        # at 131k: 1024 -> 38.7-38.9 s, 512 -> 40.3 s, 768 -> 41.8 s — the
        # 768+256 chunk split wastes the MXU), but Mosaic's scoped-VMEM
        # stack (16 MB) rejects it by ~1 MB at nb >= 128 in traced-bound
        # while bodies and at nb >= 256 everywhere (measured at 131k/262k;
        # re-measured round 4 after shrinking the diagonal-mask iotas —
        # the overflow is the covariance chunk itself, not the mask). The
        # AUTO policy is therefore conservative; callers in measured-safe
        # contexts (static-fori monolithic losses at nb <= 128, e.g.
        # gp/exact_cg.make_cg_nlml) pass ``sub=1024`` explicitly.
        # GPRAS_KMV_SUB overrides everything for sweeps.
        import os as _os

        sub = int(_os.environ.get("GPRAS_KMV_SUB", "0")) or sub_req or \
            (1024 if nb < 128 else 512)
        # descending rows + clamped j-maps: see _kmv_sym_body's nb_desc note
        def _ip(i, j):
            return nb - 1 - i

        def _jc(i, j):
            return jnp.maximum(nb - 1 - i, j)

        row, cacc = pl.pallas_call(
            partial(_kmv_sym_body, kernel, tile=tile_m, sub=sub, nb_desc=nb),
            grid=(nb, nb),
            in_specs=[
                pl.BlockSpec((tile_m, a.shape[1]), lambda i, j: (_ip(i, j), 0)),
                pl.BlockSpec((tile_m, b.shape[1]), lambda i, j: (_jc(i, j), 0)),
                pl.BlockSpec((tile_m, rw), lambda i, j: (_jc(i, j), 0)),
                pl.BlockSpec((tile_m, rw), lambda i, j: (_ip(i, j), 0)),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((tile_m, rw), lambda i, j: (_jc(i, j), 0)),
            ],
            out_specs=[
                pl.BlockSpec((tile_m, rw), lambda i, j: (_ip(i, j), 0)),
                pl.BlockSpec((tile_m, rw), lambda i, j: (_jc(i, j), 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((m_p, rw), jnp.float32),
                jax.ShapeDtypeStruct((m_p, rw), jnp.float32),
            ],
            input_output_aliases={6: 1},
            interpret=interpret,
        )(a, b, v_p, v_p, var, nz, jnp.zeros((m_p, rw), jnp.float32))
        return (row + cacc)[:n1, :r]

    out = pl.pallas_call(
        partial(_kmv_body, kernel, tile_m=tile_m, tile_n=tile_n, square=square),
        grid=(m_p // tile_m, n_p // tile_n),
        in_specs=[
            pl.BlockSpec((tile_m, a.shape[1]), lambda i, j: (i, 0)),
            pl.BlockSpec((tile_n, b.shape[1]), lambda i, j: (j, 0)),
            pl.BlockSpec((tile_n, v_p.shape[1]), lambda i, j: (j, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, v_p.shape[1]), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m_p, v_p.shape[1]), jnp.float32),
        interpret=interpret,
    )(a, b, v_p, var, nz)
    return out[:n1, :r]


# ---------------------------------------------------------------------------
# fused gradient contraction: sum_ij Kbar_ij dK_ij/dtheta without forming Kbar
# or any (panel, N) tile in HBM. Kbar is the rank-(m+1) training cotangent
#   Kbar = gh * [(1/m) W Z^T - alpha alpha^T]        (gh = 0.5 * g)
# shared by the Hutchinson (gp/exact_stochastic.py) and BBMM/CG
# (gp/exact_cg.py) backwards. Closed-form stationary-kernel derivatives with
# u = ||a_i - a_j||^2 (pre-scaled coords), K = var * f(u):
#   d log_variance    : <Kbar, var f(u)>
#   d log_lengthscale : -2 var sum_ij Kbar_ij f'(u_ij) (a_id - a_jd)^2
# expanded via (a-b)^2 = a^2 + b^2 - 2ab into row/col sums plus one
# per-dimension bilinear term a_d^T M b_d with M = Kbar * var f'(u) — all
# computed per VMEM tile with two small matmuls and accumulated into one
# (8, 128) scratch block every grid step revisits.
# ---------------------------------------------------------------------------


def _f_fp(kernel: str, r2):
    """(f(u), f'(u)) for K = var * f(u), u the scaled squared distance.

    For the r-singular kernels (Matern12 / Exponential: f'(u) ~ 1/r as
    r -> 0) the derivative is ZEROED below a distance floor — matching
    autodiff through ``sqrt(max(r2, floor))`` (the max clamps the gradient
    to 0 at coincident points) and, critically, keeping huge 1/r values out
    of the sum expansion, whose (a-b)^2 = a^2+b^2-2ab regrouping would turn
    them into catastrophic f32 cancellation (measured: 1e13-level garbage
    on the lengthscale gradient before this guard)."""
    if kernel == "RBF":
        f = jnp.exp(-0.5 * r2)
        return f, -0.5 * f
    r = jnp.sqrt(jnp.maximum(r2, 1e-36))
    # r2 > 1e-12 == r > 1e-6 scaled units: far below any distinct-point
    # separation, far above the f32 cancellation threshold
    inv2r = jnp.where(r2 > 1e-12, 0.5 / r, 0.0)
    if kernel == "Matern12":
        f = jnp.exp(-r)
        return f, -f * inv2r
    if kernel == "Matern32":
        s3r = math.sqrt(3.0) * r
        e = jnp.exp(-s3r)
        return (1.0 + s3r) * e, -1.5 * e
    if kernel == "Matern52":
        s5r = math.sqrt(5.0) * r
        e = jnp.exp(-s5r)
        return (1.0 + s5r + (5.0 / 3.0) * r2) * e, \
            -(5.0 / 6.0) * (1.0 + s5r) * e
    if kernel == "Exponential":
        f = jnp.exp(-0.5 * r)
        return f, -0.5 * f * inv2r
    raise ValueError(kernel)


def _kgrad_body(kernel: str, a_ref, b_ref, wi_ref, zj_ref, ai_ref, aj_ref,
                var_ref, gh_ref, invm_ref, acc_ref, tile: int, d: int):
    from jax.experimental import pallas as pl

    a = a_ref[:]          # (T, D) row block, pre-scaled
    b = b_ref[:]          # (T, D) col block
    var = var_ref[0, 0]
    gh = gh_ref[0, 0]
    inv_m = invm_ref[0, 0]

    ab = jax.lax.dot_general(a, b, dimension_numbers=(((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
    a2 = jnp.sum(a * a, axis=1, keepdims=True)
    b2 = jnp.sum(b * b, axis=1, keepdims=True).T
    r2 = jnp.maximum(a2 + b2 - 2.0 * ab, 0.0)
    f, fp = _f_fp(kernel, r2)

    # Kbar tile from the low-rank factors (bf16_3x contraction over m)
    wi = wi_ref[:]        # (T, m)
    zj = zj_ref[:]        # (T, m)
    ai = ai_ref[:]        # (T, 1)
    aj = aj_ref[:]        # (T, 1)

    def bdot3(x1, x2t):
        x1h = x1.astype(jnp.bfloat16)
        x1l = (x1 - x1h.astype(jnp.float32)).astype(jnp.bfloat16)
        x2h = x2t.astype(jnp.bfloat16)
        x2l = (x2t - x2h.astype(jnp.float32)).astype(jnp.bfloat16)

        def dd(p, q):
            return jax.lax.dot_general(
                p, q, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)

        return dd(x1h, x2h) + dd(x1h, x2l) + dd(x1l, x2h)

    kbar = gh * (inv_m * bdot3(wi, zj) - ai * aj.T)      # (T, T)

    g_var = jnp.sum(kbar * (var * f))                     # scalar
    m = kbar * (var * fp)                                 # (T, T)
    row_s = jnp.sum(m, axis=1)                            # (T,)
    col_t = jnp.sum(m, axis=0)                            # (T,)
    # bilinear term per dim: a_d^T (M @ b_d)
    mb = jnp.dot(m, b, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)     # (T, D)
    c_d = jnp.sum(a * mb, axis=0, keepdims=True)          # (1, D)
    s_d = jnp.sum((a * a) * row_s[:, None], axis=0, keepdims=True)
    t_d = jnp.sum((b * b) * col_t[:, None], axis=0, keepdims=True)
    g_ls = -2.0 * (s_d + t_d - 2.0 * c_d)                 # (1, D)

    i = pl.program_id(0)
    j = pl.program_id(1)
    first = (i == 0) & (j == 0)
    # lane/sublane placement via concatenate — Mosaic has no scatter lowering
    row0 = jnp.concatenate(
        [g_ls, jnp.zeros((1, 128 - d), jnp.float32)], axis=1)
    row1 = jnp.concatenate(
        [g_var.reshape(1, 1), jnp.zeros((1, 127), jnp.float32)], axis=1)
    upd = jnp.concatenate(
        [row0, row1, jnp.zeros((6, 128), jnp.float32)], axis=0)

    @pl.when(first)
    def _init():
        acc_ref[:] = upd

    @pl.when(~first)
    def _acc():
        acc_ref[:] = acc_ref[:] + upd


def _kgrad_sym_body(kernel: str, a_ref, b_ref, wi_ref, zj_ref, wj_ref,
                    zi_ref, ai_ref, aj_ref, var_ref, gh_ref, invm_ref,
                    acc_ref, tile: int, d: int):
    """Upper-triangle step of the symmetric gradient contraction.

    The distance tile u_ij and the kernel derivatives f/f' (the VPU
    transcendentals that dominate ``_kgrad_body``) are symmetric, and so is
    the (a_id - a_jd)^2 structure of the lengthscale term — only the
    low-rank cotangent Kbar is not. The mirrored tile's cotangent in the
    SAME (i, j) orientation is

        Kbar_ji^T = gh * ((1/m) Z_i W_j^T - alpha_i alpha_j^T)

    so each strictly-upper tile is processed once with the effective
    cotangent ``Kbar_ij + Kbar_ji^T`` (diagonal tiles: just Kbar_ii), and
    every downstream contraction is unchanged. Half the transcendental
    work, identical MXU totals; lower-triangle steps do nothing (the single
    (8, 128) accumulator block is live across the whole grid, and the
    j-indexed operands use clamped block maps so skipped steps cost no
    DMA).
    """
    from jax.experimental import pallas as pl

    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j >= i)
    def _compute():
        a = a_ref[:]
        b = b_ref[:]
        var = var_ref[0, 0]
        gh = gh_ref[0, 0]
        inv_m = invm_ref[0, 0]

        ab = jax.lax.dot_general(a, b,
                                 dimension_numbers=(((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST)
        a2 = jnp.sum(a * a, axis=1, keepdims=True)
        b2 = jnp.sum(b * b, axis=1, keepdims=True).T
        r2 = jnp.maximum(a2 + b2 - 2.0 * ab, 0.0)
        f, fp = _f_fp(kernel, r2)

        wi = wi_ref[:]
        zj = zj_ref[:]
        ai = ai_ref[:]
        aj = aj_ref[:]

        def bdot3(x1, x2t):
            x1h = x1.astype(jnp.bfloat16)
            x1l = (x1 - x1h.astype(jnp.float32)).astype(jnp.bfloat16)
            x2h = x2t.astype(jnp.bfloat16)
            x2l = (x2t - x2h.astype(jnp.float32)).astype(jnp.bfloat16)

            def dd(p, q):
                return jax.lax.dot_general(
                    p, q, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT)

            return dd(x1h, x2h) + dd(x1h, x2l) + dd(x1l, x2h)

        kbar = gh * (inv_m * bdot3(wi, zj) - ai * aj.T)
        mirror = (j > i).astype(jnp.float32)
        kbar = kbar + mirror * (gh * (inv_m * bdot3(zi_ref[:], wj_ref[:])
                                      - ai * aj.T))

        g_var = jnp.sum(kbar * (var * f))
        m = kbar * (var * fp)
        row_s = jnp.sum(m, axis=1)
        col_t = jnp.sum(m, axis=0)
        mb = jnp.dot(m, b, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        c_d = jnp.sum(a * mb, axis=0, keepdims=True)
        s_d = jnp.sum((a * a) * row_s[:, None], axis=0, keepdims=True)
        t_d = jnp.sum((b * b) * col_t[:, None], axis=0, keepdims=True)
        g_ls = -2.0 * (s_d + t_d - 2.0 * c_d)

        first = (i == 0) & (j == 0)
        row0 = jnp.concatenate(
            [g_ls, jnp.zeros((1, 128 - d), jnp.float32)], axis=1)
        row1 = jnp.concatenate(
            [g_var.reshape(1, 1), jnp.zeros((1, 127), jnp.float32)], axis=1)
        upd = jnp.concatenate(
            [row0, row1, jnp.zeros((6, 128), jnp.float32)], axis=0)

        @pl.when(first)
        def _init():
            acc_ref[:] = upd

        @pl.when(~first)
        def _acc():
            acc_ref[:] = acc_ref[:] + upd


def pallas_kgrad(kernel: str, params: dict[str, Array], x: Array,
                 w: Array, z: Array, alpha: Array, g: Array,
                 inv_m: float, interpret: bool = False,
                 tile: int = 512, sym: bool | None = None) -> dict[str, Array]:
    """Fused dNLML/dparams contraction for the rank-(m+1) cotangent.

    Equivalent to the panel loop
        for cols: Kbar_cols = 0.5 g [(1/m) W Z_cols^T - alpha alpha_cols^T]
                  grads += vjp(K.gram)(Kbar_cols)
    but computed tile-by-tile in VMEM: no (N, panel) Gram tile, cotangent
    tile, or autodiff residuals ever reach HBM. Returns partial grads for
    ``log_variance`` and ``log_lengthscales`` (the noise/jitter diagonal
    term is O(N m) and stays outside — see the callers).

    Everything except the Kbar low-rank contraction (bf16_3x, matching the
    framework 'high' policy) runs at full f32.

    ``sym`` (auto when >= 8 tile rows): process only upper-triangle tiles
    with the folded cotangent Kbar_ij + Kbar_ji^T (``_kgrad_sym_body``) —
    the transcendental f/f' tile is evaluated once per mirror pair. Unlike
    the sym matvec this needs no aliasing (single live accumulator block),
    so it is interpret-safe as-is.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, d = x.shape
    ls = jnp.exp(params["log_lengthscales"]).astype(jnp.float32)
    a = _pad_rows(x.astype(jnp.float32) / ls, tile)
    m_probes = w.shape[1]
    # padded rows: W/Z/alpha zero -> their Kbar rows/cols vanish, and zero
    # fp-weighted sums contribute nothing
    w_p = _pad_rows(w.astype(jnp.float32), tile)
    z_p = _pad_rows(z.astype(jnp.float32), tile)
    al_p = _pad_rows(alpha.astype(jnp.float32).reshape(-1, 1), tile)
    n_p = a.shape[0]
    var = jnp.exp(params["log_variance"]).astype(jnp.float32).reshape(1, 1)
    gh = (0.5 * jnp.asarray(g, jnp.float32)).reshape(1, 1)
    invm = jnp.asarray(inv_m, jnp.float32).reshape(1, 1)

    if sym is None:
        sym = (n_p // tile) >= 8
    if sym:
        # skipped lower-triangle steps clamp the j-indexed maps to the
        # row's own block: no DMA for work that isn't done
        def _jc(i, j):
            return jnp.maximum(i, j)

        acc = pl.pallas_call(
            partial(_kgrad_sym_body, kernel, tile=tile, d=d),
            grid=(n_p // tile, n_p // tile),
            in_specs=[
                pl.BlockSpec((tile, d), lambda i, j: (i, 0)),
                pl.BlockSpec((tile, d), lambda i, j: (_jc(i, j), 0)),
                pl.BlockSpec((tile, m_probes), lambda i, j: (i, 0)),
                pl.BlockSpec((tile, m_probes), lambda i, j: (_jc(i, j), 0)),
                pl.BlockSpec((tile, m_probes), lambda i, j: (_jc(i, j), 0)),
                pl.BlockSpec((tile, m_probes), lambda i, j: (i, 0)),
                pl.BlockSpec((tile, 1), lambda i, j: (i, 0)),
                pl.BlockSpec((tile, 1), lambda i, j: (_jc(i, j), 0)),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((8, 128), lambda i, j: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            interpret=interpret,
        )(a, a, w_p, z_p, w_p, z_p, al_p, al_p, var, gh, invm)
        return {"log_variance": acc[1, 0],
                "log_lengthscales": acc[0, :d]}

    acc = pl.pallas_call(
        partial(_kgrad_body, kernel, tile=tile, d=d),
        grid=(n_p // tile, n_p // tile),
        in_specs=[
            pl.BlockSpec((tile, d), lambda i, j: (i, 0)),
            pl.BlockSpec((tile, d), lambda i, j: (j, 0)),
            pl.BlockSpec((tile, m_probes), lambda i, j: (i, 0)),
            pl.BlockSpec((tile, m_probes), lambda i, j: (j, 0)),
            pl.BlockSpec((tile, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((tile, 1), lambda i, j: (j, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i, j: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        interpret=interpret,
    )(a, a, w_p, z_p, al_p, al_p, var, gh, invm)
    return {"log_variance": acc[1, 0],
            "log_lengthscales": acc[0, :d]}
