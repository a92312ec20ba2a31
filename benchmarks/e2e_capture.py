"""Capture the committed end-to-end pipeline reference (VERDICT r4 item 6).

Runs benchmarks/e2e_pipeline.py (the L1->L5 product path: synthetic HEC-RAS
project -> builders -> EOF -> fit -> predict -> metrics, cold artifacts then
warm cache replay) and writes benchmarks/e2e_reference.json in the schema
bench.py's stage 0 replays as ``e2e_warm_seconds_ref`` — so a deadline
salvage still carries an e2e number even when the in-run e2e stage never
gets wall-clock.

Run ON THE TPU: ``python benchmarks/e2e_capture.py``.
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
BENCH_DIR = REPO / "benchmarks"


def main() -> dict:
    proc = subprocess.run(
        [sys.executable, str(BENCH_DIR / "e2e_pipeline.py")],
        capture_output=True, text=True, timeout=1800, check=True)
    e2e = json.loads(proc.stdout.strip().splitlines()[-1])
    out = {
        "e2e_warm_seconds": e2e["warm"]["total_seconds"],
        "e2e_cold_seconds": e2e["cold"]["total_seconds"],
        "e2e_depth_rmse": e2e["warm"]["depth_rmse"],
        "protocol": "benchmarks/e2e_pipeline.py — 6-event synthetic "
                    "HEC-RAS project, full pipeline (builders -> EOF -> "
                    "GP fit -> posterior -> metrics); warm = second run "
                    "with hot compile/artifact caches.",
    }
    path = BENCH_DIR / "e2e_reference.json"
    path.write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
