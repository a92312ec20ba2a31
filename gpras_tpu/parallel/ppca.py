"""Sharded PCA/EOF for fields with very many cells (columns).

The EOF stage reduces a (samples, cells) flood field where cells can be 1e5-1e6
(SURVEY.md section 5.7). Sharding the **cell axis** over the mesh makes both the
Gram-trick eigendecomposition and the projection embarrassingly parallel:

- sample Gram: G = sum over cell shards of x_s x_s^T  -> one (S, S) psum
- eigh(G) redundantly per device (S x S is small)
- spatial EOFs: each device computes its cells' loadings locally
- transform/inverse-transform: local matmul + psum / pure-local gather

This is the distributed-PCA analog of gpras/preprocess.py:989 (IncrementalPCA
batching), redesigned as SPMD collectives instead of out-of-core batching.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

Array = jax.Array


def ppca_fit(mesh: Mesh, x: Array, n_components: int, axis: str = "i"
             ) -> tuple[Array, Array]:
    """PCA of pre-centered x (S, C) with C sharded over ``axis``.

    Returns (components (k, C) sharded on the cell axis, explained_variance (k,)).
    """
    s, c = x.shape
    d = mesh.shape[axis]
    if c % d != 0:
        raise ValueError(f"C={c} not divisible by mesh axis {axis}={d}")
    k = min(n_components, s)

    def body(x_local):
        g = jax.lax.psum(
            jnp.matmul(x_local, x_local.T, preferred_element_type=x_local.dtype),
            axis)
        evals, evecs = jnp.linalg.eigh(g)
        evals = evals[::-1][:k]
        u = evecs[:, ::-1][:, :k]  # (S, k), identical on every device
        sigma = jnp.sqrt(jnp.maximum(evals, 1e-30))
        comps_local = (x_local.T @ (u / sigma[None, :])).T  # (k, C_local)
        # same rank guard as eof/pca.py: zero the null-space rows instead of
        # amplifying float noise
        rank_ok = evals > 1e-12 * jnp.maximum(evals[0], 1e-30)
        comps_local = jnp.where(rank_ok[:, None], comps_local, 0.0)
        # svd_flip convention via the GLOBAL largest-|loading| entry so signs
        # match the single-device path: psum per-device (max, signed value)
        local_amax = jnp.argmax(jnp.abs(comps_local), axis=1)
        local_max = jnp.take_along_axis(comps_local, local_amax[:, None],
                                        axis=1)[:, 0]
        # pick the device owning the global max |value| per component
        gmax = jax.lax.pmax(jnp.abs(local_max), axis)
        signed = jnp.where(jnp.abs(local_max) == gmax, local_max, 0.0)
        signed = jax.lax.psum(signed, axis)
        signs = jnp.where(signed == 0, 1.0, jnp.sign(signed))
        comps_local = comps_local * signs[:, None]
        explained = jnp.maximum(evals, 0.0) / (s - 1)
        return comps_local, explained[None]

    fn = shard_map(body, mesh=mesh, in_specs=P(None, axis),
                   out_specs=(P(None, axis), P(axis, None)))
    comps, explained = fn(x)
    return comps, explained[0]


def ppca_transform(mesh: Mesh, x: Array, comps: Array, axis: str = "i") -> Array:
    """(S, C) @ comps^T with C sharded: local matmul + one (S, k) psum."""

    def body(x_local, comps_local):
        part = jnp.matmul(x_local, comps_local.T,
                          preferred_element_type=x_local.dtype)
        return jax.lax.psum(part, axis)

    fn = shard_map(body, mesh=mesh, in_specs=(P(None, axis), P(None, axis)),
                   out_specs=P(None, None))
    return fn(x, comps)


def ppca_inverse(mesh: Mesh, modes: Array, comps: Array, axis: str = "i") -> Array:
    """modes (S, k) @ comps (k, C): pure-local per cell shard, output sharded."""

    def body(modes_full, comps_local):
        return jnp.matmul(modes_full, comps_local,
                          preferred_element_type=modes_full.dtype)

    fn = shard_map(body, mesh=mesh, in_specs=(P(None, None), P(None, axis)),
                   out_specs=P(None, axis))
    return fn(modes, comps)
