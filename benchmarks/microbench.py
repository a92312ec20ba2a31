"""On-device microbenchmarks for the hot linalg ops (TPU, axon-safe).

All operands are generated ON DEVICE (host->device transfers through the
axon relay are slow and would pollute timings). Each op is timed with
fresh (cheaply perturbed) inputs to defeat any result memoization.

Usage: PYTHONPATH=. python benchmarks/microbench.py [op ...]
Ops: chol_xla chol_blocked syrk trsm gram
"""
import os, sys, time

import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp

N = int(os.environ.get("N", "16384"))
REPS = int(os.environ.get("REPS", "5"))


@jax.jit
def make_k(key):
    a = jax.random.normal(key, (N, 128), jnp.float32)
    return a @ a.T + N * jnp.eye(N, dtype=jnp.float32)


@jax.jit
def _perturb(x, out):
    # Data-depend each rep's input on the previous output so the axon
    # relay cannot memoize repeated identical executions.
    # relative 1e-6 keeps the perturbation above f32 ulp (value-distinct
    # inputs), while the data dependence also forces fresh buffers
    eps = jnp.tanh(jnp.asarray(out).ravel()[0]) * jnp.float32(1e-6)
    return jax.tree.map(lambda a: a + eps.astype(a.dtype), x)


def timeit(name, f, make_input, flops=None):
    keys = jax.random.split(jax.random.PRNGKey(0), REPS + 1)
    def sync(v):
        # axon platform: block_until_ready is a no-op; a scalar D2H fetch is
        # the only true barrier (and forces any deferred compile).
        return float(jnp.asarray(jax.tree.leaves(v)[0]).ravel()[0])

    x = make_input(keys[0])
    sync(x)
    out = f(x)
    sync(out)  # compile + exec
    x2 = _perturb(x, jax.tree.leaves(out)[0])
    sync(x2)   # compile perturb
    t0 = time.perf_counter()
    for i in range(REPS):
        x = _perturb(x, jax.tree.leaves(out)[0])
        out = f(x)
    sync(out)
    dt = (time.perf_counter() - t0) / REPS
    eff = f"  {flops / dt / 1e12:.1f} TFLOP/s" if flops else ""
    print(f"{name}: {dt*1e3:.1f} ms{eff}", flush=True)
    return dt


ops = sys.argv[1:] or ["syrk", "chol_xla", "chol_blocked"]

if "syrk" in ops:
    b = int(os.environ.get("B", "512"))
    for prec in ("default", "high", "highest"):
        def syrk(k, prec=prec):
            col = jax.lax.dynamic_slice(k, (0, 0), (N, b))
            return k - jnp.matmul(col, col.T, precision=prec,
                                  preferred_element_type=jnp.float32)
        timeit(f"syrk f32 {prec} (N,{b})x({b},N)", jax.jit(syrk), make_k,
               flops=2 * N * N * b)
    def syrk_bf16(k):
        col = jax.lax.dynamic_slice(k, (0, 0), (N, b)).astype(jnp.bfloat16)
        return k - jnp.matmul(col, col.T,
                              preferred_element_type=jnp.float32)
    timeit(f"syrk bf16 (N,{b})x({b},N)", jax.jit(syrk_bf16), make_k,
           flops=2 * N * N * b)

if "chol_xla" in ops:
    timeit("chol_xla", jax.jit(jnp.linalg.cholesky), make_k,
           flops=N**3 / 3)

if "chol_blocked" in ops:
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from gpras_tpu.ops.block_cholesky import blocked_cholesky
    for b in (512, 1024):
        timeit(f"chol_blocked b={b}", lambda k, b=b: blocked_cholesky(k, b),
               make_k, flops=N**3 / 3)

if "chol_super" in ops:
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from gpras_tpu.ops.block_cholesky import super_cholesky
    w = int(os.environ.get("W", "4096"))
    strip = int(os.environ.get("STRIP", "8192"))
    for prec in ("default", "high", "highest"):
        timeit(f"chol_super w={w} strip={strip} prec={prec}",
               lambda k, prec=prec: super_cholesky(k, w, strip, prec),
               make_k, flops=N**3 / 3)

if "trsm" in ops:
    m = int(os.environ.get("M", "2048"))
    def trsm(k):
        l = jnp.tril(k)
        rhs = jax.lax.dynamic_slice(k, (0, 0), (N, m))
        return jax.scipy.linalg.solve_triangular(l, rhs, lower=True)
    timeit(f"trsm (N,N)\\(N,{m})", jax.jit(trsm), make_k, flops=N * N * m)

if "kmv" in ops:
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from gpras_tpu.ops.pallas_gram import pallas_kmv
    from gpras_tpu.ops import kernels as KK2
    d = 8
    rr = int(os.environ.get("RHS", "128"))
    params = {"log_variance": jnp.zeros(()), "log_lengthscales": jnp.zeros((d,))}

    def make_xv(key):
        k1, k2 = jax.random.split(key)
        return (jax.random.normal(k1, (N, d), jnp.float32),
                jax.random.normal(k2, (N, rr), jnp.float32))

    for tile in (256, 512, 1024):
        def f(xv, tile=tile):
            x, v = xv
            return pallas_kmv("Matern52", params, x, v,
                              noise=jnp.float32(0.1), tile_m=tile, tile_n=tile)
        r_padded = ((rr + 127) // 128) * 128
        # flops: gram build 2*N*N*d + matvec over the lane-padded RHS
        timeit(f"pallas_kmv tile={tile} (N={N}, R={rr})", jax.jit(f), make_xv,
               flops=2 * N * N * (d + r_padded))

    def f_jnp(xv):
        x, v = xv
        tile = KK2.gram("Matern52", params, x)
        return tile @ v + 0.1 * v
    timeit(f"xla gram+matmul (N={N}, R={rr})", jax.jit(f_jnp), make_xv,
           flops=2 * N * N * (d + rr))

if "gram" in ops:
    from gpras_tpu.ops import kernels as K
    d = 8
    def gram(key):
        x = jax.random.normal(key, (N, d), jnp.float32)
        return x
    params = {"log_variance": jnp.zeros(()),
              "log_lengthscales": jnp.zeros((d,))}
    timeit(f"gram matern52 ({N},{N})",
           jax.jit(lambda x: K.gram("Matern52", params, x)), gram,
           flops=2 * N * N * d)
