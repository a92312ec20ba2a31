"""gpras_tpu — a TPU-native JAX framework for GP surrogate modeling of HEC-RAS floods.

A ground-up rebuild of the capability set of ``fema-ffrd/gpras`` (see SURVEY.md):
HEC-RAS/HEC-HMS data extraction, EOF/PCA spatial reduction, multi-output exact and
sparse Gaussian-process regression, posterior prediction with variance propagation,
a flood-verification metric suite, config-driven pipelines, and cross-validation —
with the compute core re-designed TPU-first:

- tiled Pallas Gram-matrix kernels and a blocked Cholesky on the MXU (``ops/``),
- custom-VJP log-marginal-likelihood so hyperparameter optimization is fully
  jitted (``gp/``), with vmapped per-EOF-mode latent GPs,
- a jitted optimizer zoo (Adam with early stop, L-BFGS, staged schedules,
  vmapped multi-start and differential evolution) (``fit/``),
- 2-D ICI-sharded Gram + distributed blocked Cholesky via ``shard_map`` for
  N>=100k training points (``parallel/``).

Host-side I/O (HEC-RAS HDF5, flow/plan text files, parquet DBs) stays on CPU in
``data/``; orchestration lives in ``pipeline/``.
"""

__version__ = "0.1.0"


def _set_numerics_policy() -> None:
    """Default every unannotated matmul to MXU ``high`` precision (bf16_3x,
    f32-equivalent accumulation).

    On TPU the hardware default is ONE bf16 pass (2^-8 epsilon) — measured to
    poison Schur complements, SGPR ELBO terms, and posterior means at the
    1e-2 relative level (docs/PERFORMANCE.md, "bf16-default poisoning").
    Hot paths that have been profiled carry explicit ``precision=`` already;
    this policy protects everything else. A user who wants raw bf16 speed can
    re-set ``jax_default_matmul_precision`` after importing gpras_tpu; a
    value already set before import is respected. No-op off-TPU.
    """
    import logging

    import jax

    try:
        if jax.config.jax_default_matmul_precision is None:
            jax.config.update("jax_default_matmul_precision", "high")
            # process-global change: make it discoverable for co-resident
            # JAX code that didn't ask for it
            logging.getLogger(__name__).debug(
                "gpras_tpu set jax_default_matmul_precision='high' "
                "(TPU default is 1-pass bf16; see docs/PERFORMANCE.md)")
    except Exception as exc:  # noqa: BLE001
        # never block `import gpras_tpu` over a numerics preference (a jax
        # version may lack the knob or reject the value) — but leave a trail
        logging.getLogger(__name__).debug(
            "matmul precision policy not applied: %r", exc)


_set_numerics_policy()

__all__ = ["GPRAS", "PreProcessor", "HmsPreProcessor", "__version__"]

_LAZY = {
    "GPRAS": ("gpras_tpu.gp.model", "GPRAS"),
    "PreProcessor": ("gpras_tpu.eof.preprocessor", "PreProcessor"),
    "HmsPreProcessor": ("gpras_tpu.eof.preprocessor", "HmsPreProcessor"),
}


def __getattr__(name):
    # Lazy top-level exports keep `import gpras_tpu` light (no JAX compile on import).
    if name in _LAZY:
        import importlib

        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
