"""Capture the committed SVGP accuracy + host-streamed ingestion reference.

Runs benchmarks/svgp_accuracy.py (held-out RMSE + 2-sigma coverage vs the
collapsed-SGPR gold at N=2^20 — VERDICT r3 weak #6a) and
benchmarks/svgp_throughput.py with GPRAS_SVGP_STREAM=1 (host-resident
archive, chunked host->device minibatch streaming — weak #6b), then writes
benchmarks/svgp_accuracy_reference.json in the schema bench.py replays as
``*_ref`` fields by default (GPRAS_BENCH_SVGP_ACC=1 re-measures in-run).

Run ON THE TPU: ``python benchmarks/svgp_accuracy_capture.py``.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
BENCH_DIR = REPO / "benchmarks"


def main() -> dict:
    import jax

    acc_out = subprocess.run(
        [sys.executable, str(BENCH_DIR / "svgp_accuracy.py")],
        capture_output=True, text=True, timeout=2400, check=True)
    acc = json.loads(acc_out.stdout.strip().splitlines()[-1])

    st_out = subprocess.run(
        [sys.executable, str(BENCH_DIR / "svgp_throughput.py")],
        capture_output=True, text=True, timeout=2400, check=True,
        env=dict(os.environ, GPRAS_SVGP_STREAM="1"))
    st = json.loads(st_out.stdout.strip().splitlines()[-1])

    out = {
        **{k: v for k, v in acc.items() if k != "platform"},
        "svgp_stream_points_per_sec": st["points_per_sec"],
        "svgp_stream_seconds_per_epoch": st["seconds_per_epoch"],
        "svgp_stream_chunk_batches": st["chunk_batches"],
        "platform": jax.devices()[0].platform,
        "measured": "round 4 (2026-08-19), on the v5e",
        "protocol": "benchmarks/svgp_accuracy.py (SVGP minibatch NGD+Adam "
                    "from standard init, 8 epochs at N=2^20/M=512/B=8192, "
                    "vs the collapsed-SGPR gold: hypers fit on a 65,536-pt "
                    "subsample with the exact collapsed bound, then "
                    "svgp.optimal_q over the FULL N; held-out RMSE on 8,192 "
                    "test points + 2-sigma coverage of y) and "
                    "benchmarks/svgp_throughput.py GPRAS_SVGP_STREAM=1 "
                    "(archive in host numpy, chunked host->device streaming "
                    "with prefetch overlap — the realistic parquet-archive "
                    "ingestion bound on this platform).",
    }
    path = BENCH_DIR / "svgp_accuracy_reference.json"
    path.write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
