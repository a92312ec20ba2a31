"""Capture the committed hard-DGP convergence reference (VERDICT r3 item 1).

Runs bench.bench_converged_fit(N, dgp="hard") with the in-run cold fit
(GPRAS_BENCH_COLD=1: Adam lr=0.02 from standard init under the reference
stopping rule, gpras/gpr.py:162-173, to the 600-step cap — l_star is its
best loss) AND the warm-started rule-convergence pass
(GPRAS_BENCH_RULE_CONVERGENCE=1), then writes
benchmarks/convergence_reference_hard.json in the schema
bench.bench_converged_fit replays by default.

The headline protocol's integrity hinges on what this records: on the hard
DGP (bench._make_data_hard — 3 active dims at 3 scales + 5 ARD-nuisance
dims) the coarse warm-start rungs cannot identify the short-wavelength
component, so band entry requires timed full-N polish steps
(fit_to_convergence_polish_steps > 0); the capture asserts that.

Run ON THE TPU: ``python benchmarks/convergence_capture_hard.py [N]``.
``--reuse-lstar`` keeps the committed cold-fit fields (l_star and its
timings) from the existing JSON and re-measures only the warm-started
stages — for iterating on the warm protocol without re-paying the ~27 min
rule-fired cold fit; the committed L* is protocol-independent.
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
    reuse = "--reuse-lstar" in sys.argv
    if not reuse:
        os.environ["GPRAS_BENCH_COLD"] = "1"
    os.environ["GPRAS_BENCH_RULE_CONVERGENCE"] = "1"
    # Cold must run TO THE RULE FIRING (~1900 steps at lr=0.02), not a
    # 600-step cap: the capped loss sits far above the rule plateau and the
    # warm start certifies straight past it (measured at N=8192 —
    # 600-cap L* -6307.9 vs rule-fired -6438.6, warm cert -6388.8).
    os.environ.setdefault("GPRAS_BENCH_MAX_STEPS", "2500")

    import jax

    import bench

    argv = [a for a in sys.argv[1:] if not a.startswith("-")]
    n = int(argv[0]) if argv else 49152
    lr = float(os.environ.get("GPRAS_BENCH_LR", "0.02"))
    path = REPO / "benchmarks" / "convergence_reference_hard.json"

    t0 = time.perf_counter()
    res = bench.bench_converged_fit(n, dgp="hard")
    total = time.perf_counter() - t0
    print(f"# capture run: {json.dumps(res)}", file=sys.stderr)

    if reuse:
        prev = json.loads(path.read_text())
        if int(prev["n"]) != n or float(prev["lr"]) != lr:
            raise SystemExit("--reuse-lstar: committed reference is for a "
                             "different (n, lr); run a full capture")
        assert res.get("target_loss_source") == "committed_reference"
        for k in ("converged_loss", "converged_fit_seconds",
                  "converged_fit_steps", "converged_by_rule"):
            res.setdefault(k, prev["l_star" if k == "converged_loss"
                           else f"cold_{k}"])

    out = {
        "n": n,
        "d": 8,
        "dgp": "hard",
        "kernel": "Matern52",
        "lr": lr,
        "seed": 7,
        "max_steps": int(os.environ.get("GPRAS_BENCH_MAX_STEPS", "600")),
        "l_star": res["converged_loss"],
        "cold_converged_fit_seconds": res["converged_fit_seconds"],
        "cold_converged_fit_steps": res["converged_fit_steps"],
        "cold_converged_by_rule": res["converged_by_rule"],
        "warmstarted_rule_converged_seconds":
            res.get("warmstarted_rule_converged_seconds"),
        "warmstarted_rule_converged_steps":
            res.get("warmstarted_rule_converged_steps"),
        "warmstarted_rule_converged_by_rule":
            res.get("warmstarted_rule_converged_by_rule"),
        "warmstarted_rule_converged_loss":
            res.get("warmstarted_rule_converged_loss"),
        "capture_warm_ladder": res.get("warm_ladder"),
        "capture_band_certified_by": res.get("band_certified_by"),
        "capture_fit_to_convergence_seconds":
            res.get("fit_to_convergence_seconds"),
        "capture_fit_to_convergence_polish_steps":
            res.get("fit_to_convergence_polish_steps"),
        "capture_total_seconds": round(total, 1),
        "cold_fields_reused": reuse,
        "platform": jax.devices()[0].platform,
        "measured": "round 4 (2026-08-19), on the v5e",
        "protocol": "Cold fit: Adam lr=0.02 from standard init on the "
                    "bench._make_data_hard seeded problem (N=49152, d=8, "
                    "Matern52, Hutchinson stochastic-trace loss, noise floor "
                    "1e-4, non-finite step rejection) run UNTIL the "
                    "reference early-stop rule fires (rel-tol 1e-5, patience "
                    "50, gpras/gpr.py:162-173; cap 2500 steps); l_star is "
                    "its best loss. The hard DGP's response varies along 3 "
                    "dims at 3 scales (+5 ARD-nuisance dims), so the "
                    "single-rung warm start (max(2048, N/12) points, "
                    "standard init) lands well outside the stop band "
                    "(patience*tol*|L*|, the rule's own resolution) and the "
                    "headline times full-N polish steps to first band entry "
                    "(bench.bench_converged_fit). Rule-converged: the "
                    "warm-started fit run until the reference rule fires.",
    }
    path.write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out))
    # The capture is only a valid headline reference if the warm start had
    # to take timed full-N polish steps to enter the band (the whole point
    # of the hard DGP). The file is written first for forensics.
    if out["capture_band_certified_by"] != "polish_steps" \
            or (out["capture_fit_to_convergence_polish_steps"] or 0) <= 0:
        raise SystemExit(
            "capture invalid: band entry did not require full-N polish "
            f"steps (certified_by={out['capture_band_certified_by']!r}, "
            f"polish_steps={out['capture_fit_to_convergence_polish_steps']})")
    return out


if __name__ == "__main__":
    main()
