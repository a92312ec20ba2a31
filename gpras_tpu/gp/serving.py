"""Production serving: low-latency batched posterior prediction.

The pipeline's predict phase is batch-oriented; serving wants repeated calls
with varying event counts and no recompiles. ``PosteriorPredictor`` loads a
GPRAS checkpoint once, precomputes the per-mode posterior factors, and serves
jitted predictions with **shape bucketing**: query batches are padded up to a
fixed bucket ladder so XLA compiles at most ``len(buckets)`` programs, after
which every request is compile-free. Optionally composes the EOF
reverse-transform so callers get full cell fields + propagated variance.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from gpras_tpu.eof.preprocessor import PreProcessor
from gpras_tpu.gp.model import GPRAS

DEFAULT_BUCKETS = (256, 1024, 4096, 16384)


class PosteriorPredictor:
    """Serve a trained GPRAS model (and optional EOF preprocessors)."""

    def __init__(self, model_path: str | Path,
                 hf_preprocessor_path: str | Path | None = None,
                 lf_preprocessor_path: str | Path | None = None,
                 buckets: tuple[int, ...] = DEFAULT_BUCKETS):
        self.model = GPRAS.from_file(model_path)
        self.model._ensure_cache()  # factorize once at load time
        self.buckets = tuple(sorted(buckets))
        self.hf_pre = (PreProcessor.from_file(hf_preprocessor_path)
                       if hf_preprocessor_path else None)
        if lf_preprocessor_path:
            from gpras_tpu.eof.preprocessor import HmsPreProcessor
            from gpras_tpu.utils.serialization import load_artifact

            meta, _ = load_artifact(lf_preprocessor_path)
            cls = HmsPreProcessor if meta.get("class") == "HmsPreProcessor" else PreProcessor
            self.lf_pre = cls.from_file(lf_preprocessor_path)
        else:
            # No silent HF fallback: transforming an LF field with the HF
            # EOF basis returns garbage whenever the meshes happen to have
            # the same cell count. predict_field refuses without an LF
            # preprocessor; predict_modes (already-transformed inputs)
            # remains usable.
            self.lf_pre = None

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return n  # beyond the ladder: compile for the exact size

    def predict_modes(self, x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(mean, variance) in EOF-mode space, padded-bucketed, compile-free
        after warmup."""
        x = np.asarray(x)
        n = x.shape[0]
        b = self._bucket(n)
        if b > n:
            x = np.concatenate([x, np.zeros((b - n, x.shape[1]), x.dtype)])
        mean, var = self.model.predict(x)
        return mean[:n], var[:n]

    def predict_field(self, lf_field: np.ndarray
                      ) -> tuple[np.ndarray, np.ndarray]:
        """LF cell field -> (HF field, variance) through the full chain:
        LF transform -> GP posterior -> reverse transform with variance."""
        if self.lf_pre is None or self.hf_pre is None:
            raise RuntimeError("predict_field requires preprocessor artifacts")
        x = self.lf_pre.transform(np.asarray(lf_field))
        mean, var = self.predict_modes(x)
        return self.hf_pre.reverse_transform(mean, var)

    def warmup(self, n_features: int | None = None) -> None:
        """Compile every bucket up front (call at service start)."""
        if n_features is None:
            n_features = int(np.asarray(self.model.x).shape[1])
        for b in self.buckets:
            self.predict_modes(np.zeros((b, n_features), dtype=np.float32))
