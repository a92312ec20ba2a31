"""Capture the committed cold-canary trajectory (bench.bench_cold_canary).

Runs the EXACT call the in-bench canary makes — the first K iterations of
the deterministic cold L-BFGS fit (gp/coldfit.fit_exact, fixed probe key)
on the headline problem — and writes
benchmarks/cold_canary_reference.json with the per-iteration losses. The
trajectory is a pure function of (problem, engine policy), so any later
regression in fit/optimizers.py, gp/exact_stochastic.py, or the
blocked-Cholesky / Pallas-Gram stack shifts a loss and trips
``cold_canary_ok`` in the default bench run.

Run ON THE TPU (the committed reference must match what the driver's bench
run executes): ``python benchmarks/cold_canary_capture.py [N] [ITERS]``.
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
    from gpras_tpu.gp.coldfit import fit_exact

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 49152
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    dgp = os.environ.get("GPRAS_BENCH_DGP", "hard")

    x, y = bench._make_data(n, 8, jnp.float32, dgp)
    t0 = time.perf_counter()
    _, info = fit_exact("Matern52", x, y, max_iter=iters, chunk=iters)
    dt = time.perf_counter() - t0
    losses = [float(v) for v in np.asarray(info["losses"])[:iters]]
    out = {
        "n": n,
        "d": 8,
        "dgp": dgp,
        "kernel": "Matern52",
        "iters": iters,
        "losses": losses,
        "rel_tol": 1e-6,
        "capture_seconds": round(dt, 2),
        "platform": jax.devices()[0].platform,
        "protocol": "bench.bench_cold_canary: fit_exact('Matern52', x, y, "
                    "max_iter=K, chunk=K) — cold zoom-linesearch L-BFGS over "
                    "the dense Hutchinson estimator, fixed probe key, "
                    "deterministic per-iteration losses.",
    }
    path = REPO / "benchmarks" / "cold_canary_reference.json"
    path.write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
