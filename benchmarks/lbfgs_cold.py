"""Cold L-BFGS exact-GP fit to the committed convergence band (no warm start).

The committed cold baseline (benchmarks/convergence_reference.json) is Adam
lr=0.02 from standard init: 600 steps / 614 s to L* = -42,869.6 on the
bench.py seeded problem (N=49,152, d=8, Matern52, Hutchinson stochastic-trace
loss). This script runs the SAME problem from the SAME init through the
host-chunked zoom-linesearch L-BFGS driver (fit/optimizers.py
lbfgs_fit_chunked) with the band-entry stopping rule (loss <= L* + 1e-5|L*|).

Measured (TPU v5e, warm compile cache): band entry at iteration 23;
total wall ~134 s on a quiet relay (the second dispatch carries the hard
linesearches, ~118 s device-side; relay contention can stretch that chunk —
docs/PERFORMANCE.md "Cold fits: L-BFGS"). The trajectory itself is
deterministic: every run reproduces the same per-iteration losses.

Run: ``python benchmarks/lbfgs_cold.py [N] [MAX_ITER] [CHUNK]``
Knobs: GPRAS_LBFGS_LS (max zoom-linesearch steps, default 8),
GPRAS_LBFGS_MEM (memory pairs, default 15).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))


def main() -> dict:
    import numpy as np

    import jax
    import jax.numpy as jnp

    import bench
    from gpras_tpu.fit.optimizers import lbfgs_fit_chunked
    from gpras_tpu.gp import exact

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 49152
    max_iter = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    chunk = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    ls = int(os.environ.get("GPRAS_LBFGS_LS", "8"))
    mem = int(os.environ.get("GPRAS_LBFGS_MEM", "15"))

    x, y = bench._make_data(n, 8, jnp.float32)
    params0 = exact.init_params("Matern52", x, noise_variance=0.1)
    loss = bench._robust_loss("Matern52", n)
    key = jax.random.PRNGKey(0)

    def loss_fn(p):
        # fixed probe key: the Hutchinson VALUE is exact either way; fixing
        # the probes makes the loss a deterministic function for the
        # linesearch (bench.py:409)
        return loss(p, x, y, key)

    ref = json.loads(
        (REPO / "benchmarks" / "convergence_reference.json").read_text())
    l_star = float(ref["l_star"]) if int(ref.get("n", -1)) == n else None

    # warmup on a throwaway copy: compile/load only (one chunk program)
    _ = lbfgs_fit_chunked(loss_fn, params0, max_iter=chunk, chunk=chunk,
                          memory_size=mem, max_linesearch_steps=ls)
    print(f"# warmup ok (chunk of {chunk} at N={n})", file=sys.stderr)

    t0 = time.perf_counter()
    p, info = lbfgs_fit_chunked(
        loss_fn, params0, max_iter=max_iter, chunk=chunk, memory_size=mem,
        max_linesearch_steps=ls, stop_loss=l_star,
        floors={"log_noise_variance": float(np.log(1e-4))})
    total = time.perf_counter() - t0

    losses = np.asarray(info["losses"])
    finite = losses[np.isfinite(losses)]
    out = {
        "n": n,
        "iterations": int(info["iterations"]),
        "stopped_by": info["stopped_by"],
        "cold_lbfgs_seconds": round(total, 1),
        "best_loss": round(float(finite.min()), 2) if finite.size else None,
        "l_star": l_star,
        "cold_adam_seconds_ref": ref.get("cold_converged_fit_seconds")
        if l_star is not None else None,
        "platform": jax.devices()[0].platform,
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
