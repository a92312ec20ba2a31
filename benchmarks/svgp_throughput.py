"""SVGP streaming-fit throughput at archive scale (N far beyond HBM-dense).

The minibatch engine (gp/svgp.py) never materializes anything N-shaped, so a
single chip trains on datasets the exact ladder cannot touch at any setting.
This script measures epochs of minibatch NGD+Adam on a synthetic archive —
generated ON DEVICE (host->device transfer of an N-sized array would dominate
and measure the tunnel, not the math; see CLAUDE.md environment gotchas).

Per-epoch work: (N // B) steps, each one Kuu Cholesky (M^3/3) + the (M, B)
cross-Gram/projection matmuls (the MXU term) + the conjugate NGD update.

Run: ``python benchmarks/svgp_throughput.py`` (TPU; CPU works at small sizes)
Knobs: GPRAS_SVGP_N (default 1_048_576), GPRAS_SVGP_M (512),
GPRAS_SVGP_B (8192), GPRAS_SVGP_D (8), GPRAS_SVGP_EPOCHS (3, timed after one
warmup epoch program run ... the same compiled program, so warm = steady
state), GPRAS_SVGP_NATGRAD (0.5; 0 disables NGD).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      str(REPO / ".jax_cache"))


def main() -> dict:
    import jax
    import jax.numpy as jnp

    from gpras_tpu.gp import svgp

    n = int(os.environ.get("GPRAS_SVGP_N", str(1 << 20)))
    m = int(os.environ.get("GPRAS_SVGP_M", "512"))
    b = int(os.environ.get("GPRAS_SVGP_B", "8192"))
    d = int(os.environ.get("GPRAS_SVGP_D", "8"))
    epochs = int(os.environ.get("GPRAS_SVGP_EPOCHS", "3"))
    ng = float(os.environ.get("GPRAS_SVGP_NATGRAD", "0.5"))

    # synthetic archive generated on device: smooth response + noise
    @jax.jit
    def make_data(key):
        kx, ke = jax.random.split(key)
        x = jax.random.normal(kx, (n, d), jnp.float32)
        y = (jnp.sin(2.0 * x[:, 0]) + 0.5 * jnp.tanh(x[:, 1] * x[:, 2])
             + 0.05 * jax.random.normal(ke, (n,), jnp.float32))
        return x, y

    x, y = make_data(jax.random.PRNGKey(0))
    z = x[:m]
    params = svgp.init_params("Matern52", x, z, noise_variance=0.1)

    fit = svgp.make_minibatch_fit(
        "Matern52", batch_size=b, epochs=epochs, learning_rate=0.005,
        natgrad=ng if ng > 0 else None)

    # compile/load (one program for the whole multi-epoch fit), discarded
    p_warm, hist = fit(params, x, y, jax.random.PRNGKey(1))
    float(hist[-1])  # scalar fetch = the sync barrier in this environment

    t0 = time.perf_counter()
    p_fit, hist = fit(params, x, y, jax.random.PRNGKey(2))
    final_loss = float(hist[-1])  # sync
    dt = time.perf_counter() - t0

    steps = epochs * (n // b)
    out = {
        "n": n, "m": m, "batch": b, "epochs": epochs, "natgrad": ng,
        "fit_seconds": round(dt, 3),
        "seconds_per_epoch": round(dt / epochs, 3),
        "steps_per_sec": round(steps / dt, 2),
        "points_per_sec": round(steps * b / dt, 1),
        "final_epoch_loss": round(final_loss, 2),
        "platform": jax.devices()[0].platform,
    }
    del p_warm, p_fit
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
