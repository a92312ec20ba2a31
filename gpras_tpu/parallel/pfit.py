"""Data-parallel hyperparameter search over a device mesh.

SURVEY.md section 2.2's checklist: "data-parallel hyperparameter search ->
pmap/shard over multi-start restarts (gpr.py:87) and DE populations
(gpr.py:65)". Restarts/population members are embarrassingly parallel; sharding
the leading (restart/member) axis over the mesh lets XLA split the vmapped
fitting program across devices with zero communication until the final argmin.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gpras_tpu.fit import optimizers as fitters

Array = jax.Array


def _shard_leading(mesh: Mesh, tree, axis: str):
    sharding = jax.tree.map(
        lambda leaf: NamedSharding(mesh, P(axis, *([None] * (leaf.ndim - 1)))),
        tree)
    return jax.device_put(tree, sharding)


def sharded_multi_start(
    mesh: Mesh,
    loss_fn: Callable[[dict], Array],
    params: dict[str, Array],
    x: Array | None = None,
    n_starts: int = 40,
    iter_initial: int = 20,
    iter_final: int = 1000,
    seed: int = 1,
    axis: str = "i",
) -> tuple[dict[str, Array], dict[str, Array]]:
    """The reference's "stochastic" strategy with restarts sharded over the mesh
    (each device Adam-fits its slice of restarts concurrently), then an L-BFGS
    polish of the winner. ``n_starts`` is rounded up to a multiple of the mesh
    axis size."""
    d = mesh.shape[axis]
    n_starts = ((n_starts + d - 1) // d) * d
    keys = jax.random.split(jax.random.PRNGKey(seed), n_starts)
    starts = jax.vmap(
        lambda k: fitters._sample_restart(k, params, x))(keys)
    starts = _shard_leading(mesh, starts, axis)

    @jax.jit
    def fit_all(starts_b):
        def one(p):
            p2, info = fitters.adam_fit(loss_fn, p, iter_initial)
            return p2, info["loss"]

        return jax.vmap(one)(starts_b)

    fitted, losses = fit_all(starts)
    best = int(jnp.nanargmin(losses))
    best_params = jax.tree.map(lambda v: v[best], fitted)
    # polish on a single device (replicated program)
    p, info = fitters.lbfgs_fit(loss_fn, best_params, iter_final)
    info["restart_losses"] = losses
    return p, info


def sharded_de(
    mesh: Mesh,
    loss_fn: Callable[[dict], Array],
    params: dict[str, Array],
    popsize: int = 15,
    max_iter: int = 500,
    axis: str = "i",
    **kwargs,
) -> tuple[dict[str, Array], dict[str, Array]]:
    """Differential evolution with each generation's energy evaluations
    explicitly sharded over the mesh: the population rows are split across
    devices with shard_map and each device vmaps its slice (a use_mesh
    context alone would NOT shard de_fit's internally-created population).
    ``popsize`` is rounded up so the population divides the mesh axis."""
    d = mesh.shape[axis]
    popsize = ((popsize + d - 1) // d) * d  # n_pop = 3*popsize divides d

    def eval_map(f):
        def batched(pop):
            local = shard_map(lambda p_loc: jax.vmap(f)(p_loc), mesh=mesh,
                              in_specs=P(axis), out_specs=P(axis))
            return local(pop)

        return batched

    return fitters.de_fit(loss_fn, params, popsize=popsize,
                          max_iter=max_iter, eval_map=eval_map, **kwargs)
