"""Capture a committed canary trajectory (bench.bench_canaries).

Runs the EXACT computation the in-bench canary replays — a few
deterministic fixed-seed losses on one engine family — and writes
``benchmarks/<name>_canary_reference.json``:

- ``cold``: first K iterations of the deterministic cold L-BFGS fit
  (gp/coldfit.fit_exact, fixed probe key) — the dense-Hutchinson +
  blocked-Cholesky / Pallas-Gram stack. Default n=16,384 (~25 s warm).
- ``cg``: K fixed-seed Adam steps on the matrix-free BBMM CG+SLQ loss —
  the Pallas kmv matvec, mbcg, SLQ logdet and pivoted-Cholesky
  preconditioner. Default n=8,192 (~seconds warm).
- ``svgp``: one fixed-seed minibatch epoch (NGD on q + Adam on
  hyperparameters) — the streaming engine's jitted scan. Default n=8,192.

Run ON THE TPU (the committed reference must match what the driver's bench
run executes): ``python benchmarks/canary_capture.py cold|cg|svgp [KEY=VAL
...]`` — e.g. ``python benchmarks/canary_capture.py cg n=8192 iters=3``.
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

#: per-canary default protocol (the dict the trajectory fn reads; the
#: in-bench replay reads the SAME keys back from the committed json)
DEFAULTS: dict[str, dict] = {
    "cold": {"n": 16384, "d": 8, "iters": 3, "dgp": "hard",
             "kernel": "Matern52", "rel_tol": 1e-6,
             "protocol": "bench.cold_canary_losses: fit_exact('Matern52', "
                         "x, y, max_iter=K, chunk=K) — cold zoom-linesearch "
                         "L-BFGS over the dense Hutchinson estimator, fixed "
                         "probe key, deterministic per-iteration losses."},
    "cg": {"n": 8192, "d": 8, "iters": 3, "dgp": "hard",
           "kernel": "Matern52", "rel_tol": 1e-6,
           "probes": 16, "cg_iters": 8, "precond_rank": 16,
           "protocol": "bench.cg_canary_losses: K Adam(0.02) steps on "
                       "make_cg_training_loss(probes, cg_iters, "
                       "precond_rank), probe key chain split from "
                       "PRNGKey(0)."},
    "svgp": {"n": 8192, "d": 8, "m": 64, "batch_size": 2048, "epochs": 1,
             "dgp": "hard", "kernel": "Matern52", "rel_tol": 1e-6,
             "protocol": "bench.svgp_canary_losses: one "
                         "make_minibatch_fit(batch_size, epochs, lr=0.01, "
                         "natgrad=0.5) epoch from PRNGKey(0)."},
}


def main() -> dict:
    import jax

    import bench

    name = sys.argv[1] if len(sys.argv) > 1 else "cold"
    if name not in bench.CANARIES:
        raise SystemExit(f"unknown canary {name!r}; "
                         f"expected one of {sorted(bench.CANARIES)}")
    ref = dict(DEFAULTS[name])
    for kv in sys.argv[2:]:
        k, v = kv.split("=", 1)
        ref[k] = type(ref.get(k, ""))(v) if k in ref else v

    _, fn = bench.CANARIES[name]
    t0 = time.perf_counter()
    losses, run_s = fn(ref)
    ref["losses"] = losses
    ref["capture_seconds"] = round(time.perf_counter() - t0, 2)
    ref["run_seconds"] = round(run_s, 2)
    ref["platform"] = jax.devices()[0].platform
    path = REPO / "benchmarks" / f"{name}_canary_reference.json"
    path.write_text(json.dumps(ref, indent=2) + "\n")
    print(json.dumps(ref))
    return ref


if __name__ == "__main__":
    main()
