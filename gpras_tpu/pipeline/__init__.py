"""Config-driven orchestration: pipeline, cross-validation, event tooling."""

__all__ = ["Config", "pipeline"]

_LAZY = {
    "Config": ("gpras_tpu.pipeline.config", "Config"),
    "pipeline": ("gpras_tpu.pipeline.pipeline", "pipeline"),
}


def __getattr__(name):
    # Lazy re-exports: `from gpras_tpu.pipeline import Config, pipeline` is
    # the documented entry point (docs/migration.md) without importing the
    # full pipeline stack (pandas/h5py) on package import.
    if name in _LAZY:
        import importlib

        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
