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
