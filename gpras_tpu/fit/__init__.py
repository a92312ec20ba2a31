"""Jitted optimizer zoo for GP hyperparameter fitting."""

from gpras_tpu.fit.optimizers import (  # noqa: F401
    FITTERS,
    adam_fit,
    adadelta_fit,
    de_fit,
    fit,
    lbfgs_fit,
    multi_start_fit,
    three_stage_fit,
    two_stage_fit,
)
