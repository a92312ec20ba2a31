"""Hyperparameter priors.

The reference places LogNormal(0, 1) priors on the kernel variance, kernel
lengthscales, and likelihood (noise) variance "to avoid pathological models"
(reference gpras/gpr.py:301-305), and optimizes a loss of the form
``-(log_marginal + log_prior_density)`` where the prior density is evaluated with
the change-of-variables correction for the unconstrained optimization space.

We parameterize positive hyperparameters in log-space. For eta = log(theta),
``LogNormal(0,1).log_prob(theta) + log|d theta / d eta|`` reduces exactly to
``Normal(0,1).log_prob(eta)``, so the prior contribution is a standard-normal
log-density on each unconstrained parameter. This is mathematically identical to
the reference's LogNormal-prior training loss (up to GPflow's softplus-vs-exp
transform, which does not change the constrained-space prior).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

Array = jax.Array

#: Unconstrained parameter names that carry the LogNormal(0,1) prior, matching the
#: three priors set by the reference (gpras/gpr.py:303-305).
PRIOR_PARAM_NAMES = ("log_variance", "log_lengthscales", "log_noise_variance")


def log_prior(params: dict[str, Array], names: tuple[str, ...] = PRIOR_PARAM_NAMES) -> Array:
    """Sum of Normal(0,1) log-densities over the unconstrained prior-carrying params."""
    total = jnp.asarray(0.0, dtype=jnp.result_type(*jax.tree.leaves(params)))
    for name in names:
        if name in params:
            eta = params[name]
            total = total + jnp.sum(-0.5 * eta * eta - 0.5 * math.log(2.0 * math.pi))
    return total
