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
from typing import Callable

import numpy as np

from gpras_tpu.eof.preprocessor import PreProcessor
from gpras_tpu.gp.model import GPRAS

DEFAULT_BUCKETS = (256, 1024, 4096, 16384)


def make_field_decoder(
    eofs: np.ndarray,
    x_mean: np.ndarray,
    x_std: np.ndarray,
    input_mean: np.ndarray,
    dry_mask: np.ndarray,
    weights: np.ndarray | None = None,
    elevations: np.ndarray | None = None,
    hydraulic_parameter: str = "wse",
) -> Callable:
    """Device-side EOF reverse transform: a jitted ``(mode_mean, mode_var) ->
    (field, field_var)`` decoder, numerically identical to
    ``PreProcessor.reverse_transform`` (gpras/preprocess.py:1052-1094) but
    running entirely on device so serving can fuse GP posterior + field
    reconstruction in one program.

    ``eofs`` is (modes, n_wet); ``dry_mask`` is the (n_cells,) boolean
    always-dry mask; inputs to the returned fn are (events, modes); outputs
    are (events, n_cells). Dry cells are filled with 0 (depth) or elevation
    (wse); their variance is 0.
    """
    import jax
    import jax.numpy as jnp

    dry_mask = np.asarray(dry_mask, bool)
    n_cells = dry_mask.shape[0]
    wet_idx = jnp.asarray(np.flatnonzero(~dry_mask))
    eofs_d = jnp.asarray(eofs)
    x_mean_d = jnp.asarray(x_mean)
    x_std_d = jnp.asarray(x_std)
    input_mean_d = jnp.asarray(input_mean)
    inv_w = None if weights is None else 1.0 / jnp.asarray(weights)
    # exact variance-propagation matrix: (diag(x_std) @ eofs / weights)^2
    a = x_std_d[:, None] * eofs_d
    if inv_w is not None:
        a = a * inv_w[None, :]
    var_transform = a * a
    if hydraulic_parameter == "depth":
        fill = jnp.zeros((n_cells,), eofs_d.dtype)
    else:
        if elevations is None:
            raise ValueError("wse decoding requires elevations for dry fill")
        fill = jnp.where(jnp.asarray(dry_mask), jnp.asarray(elevations, eofs_d.dtype), 0.0)

    @jax.jit
    def decode(mode_mean, mode_var=None):
        m = mode_mean * x_std_d + x_mean_d
        wet = jnp.matmul(m, eofs_d, preferred_element_type=m.dtype)
        if inv_w is not None:
            wet = wet * inv_w[None, :]
        wet = wet + input_mean_d
        s = mode_mean.shape[0]
        full = jnp.broadcast_to(fill, (s, n_cells)).at[:, wet_idx].set(wet)
        if mode_var is None:
            return full
        var_wet = jnp.matmul(mode_var, var_transform,
                             preferred_element_type=wet.dtype)
        var_full = jnp.zeros((s, n_cells), wet.dtype).at[:, wet_idx].set(var_wet)
        return full, var_full

    return decode


def field_decoder_from_preprocessor(pre: PreProcessor) -> Callable:
    """Build the device decoder from a fitted ``PreProcessor``."""
    return make_field_decoder(
        pre.eofs, pre.x_mean, pre.x_std, pre.input_mean, pre.dry_indices,
        weights=pre.weights, elevations=pre.elevations,
        hydraulic_parameter=pre.hydraulic_parameter)


class PosteriorPredictor:
    """Serve a trained GPRAS model (and optional EOF preprocessors)."""

    def __init__(self, model_path: str | Path,
                 hf_preprocessor_path: str | Path | None = None,
                 lf_preprocessor_path: str | Path | None = None,
                 buckets: tuple[int, ...] = DEFAULT_BUCKETS):
        self.model = GPRAS.from_file(model_path)
        self.model._ensure_cache()  # factorize once at load time
        self.buckets = tuple(sorted(buckets))
        self._decoder = None
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

    def _predict_modes_padded(self, x: np.ndarray
                              ) -> tuple[np.ndarray, np.ndarray, int]:
        """(mean, variance, n) at the padded bucket size (rows >= n are
        garbage from zero-padded queries and must be sliced off by callers)."""
        x = np.asarray(x)
        n = x.shape[0]
        b = self._bucket(n)
        if b > n:
            x = np.concatenate([x, np.zeros((b - n, x.shape[1]), x.dtype)])
        mean, var = self.model.predict(x)
        return mean, var, n

    def predict_modes(self, x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(mean, variance) in EOF-mode space, padded-bucketed, compile-free
        after warmup."""
        mean, var, n = self._predict_modes_padded(x)
        return mean[:n], var[:n]

    def predict_field(self, lf_field: np.ndarray, *, device_decode: bool = True
                      ) -> tuple[np.ndarray, np.ndarray]:
        """LF cell field -> (HF field, variance) through the full chain:
        LF transform -> GP posterior -> reverse transform with variance.

        ``device_decode`` runs the EOF reconstruction through the jitted
        ``make_field_decoder`` program (numerically identical to the host
        ``reverse_transform`` — see test_serving); pass False to force the
        reference-parity host path."""
        if self.lf_pre is None or self.hf_pre is None:
            raise RuntimeError("predict_field requires preprocessor artifacts")
        x = self.lf_pre.transform(np.asarray(lf_field))
        if device_decode:
            # decode at the PADDED bucket shape so the jitted decoder compiles
            # once per bucket (decoding the sliced array would recompile for
            # every distinct request size), then slice the valid rows
            mean, var, n = self._predict_modes_padded(x)
            if self._decoder is None:
                self._decoder = field_decoder_from_preprocessor(self.hf_pre)
            f, fv = self._decoder(np.asarray(mean, np.float64),
                                  np.asarray(var, np.float64))
            return np.asarray(f)[:n], np.asarray(fv)[:n]
        mean, var = self.predict_modes(x)
        return self.hf_pre.reverse_transform(mean, var)

    def warmup(self, n_features: int | None = None) -> None:
        """Compile every bucket up front (call at service start); when the
        EOF artifacts are loaded this includes the field-decode program, so
        steady-state ``predict_field`` is fully compile-free."""
        if n_features is None:
            n_features = int(np.asarray(self.model.x).shape[1])
        decode = None
        if self.hf_pre is not None:
            if self._decoder is None:
                self._decoder = field_decoder_from_preprocessor(self.hf_pre)
            decode = self._decoder
        for b in self.buckets:
            mean, var = self.predict_modes(
                np.zeros((b, n_features), dtype=np.float32))
            if decode is not None:
                decode(np.asarray(mean, np.float64),
                       np.asarray(var, np.float64))
