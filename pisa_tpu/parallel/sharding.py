"""
Device meshes and event-axis sharding for compiled templates.

See package docstring. Replaces the reference's multi-process llh server
farm (``pisa/utils/llh_server.py``, ``llh_client.py``) with in-program SPMD
over a ``jax.sharding.Mesh``.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pisa_tpu.utils.log import logging

__all__ = ["default_mesh", "shard_containers", "build_batched_objective"]


def default_mesh(n_devices=None, axis_name="data") -> Mesh:
    """A 1-D mesh over (the first `n_devices` of) the available devices."""
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise RuntimeError(
                f"need {n_devices} devices; have {len(devices)}"
            )
        devices = devices[:n_devices]
    return Mesh(np.array(devices), axis_names=(axis_name,))


def _shard_array(arr, mesh, axis_name):
    """device_put `arr` sharded on its leading axis if compatible, else
    replicated. Returns the placed jax array."""
    arr = np.asarray(arr) if not isinstance(arr, jax.Array) else arr
    n = mesh.devices.size
    if np.ndim(arr) >= 1 and arr.shape[0] % n == 0 and arr.shape[0] >= n:
        spec = P(axis_name, *([None] * (np.ndim(arr) - 1)))
    else:
        spec = P()
    return jax.device_put(arr, NamedSharding(mesh, spec))


def shard_containers(data, mesh, axis_name="data"):
    """Shard every array of every container in a ContainerSet across `mesh`
    on its leading (event/grid-point) axis.

    Arrays whose leading axis is not divisible by the mesh size are
    replicated instead (with a debug log). After this, any computation traced
    over the containers — in particular a :class:`CompiledTemplate` — is
    partitioned by XLA across the mesh devices.
    """
    n = mesh.devices.size
    for container in data.containers:
        for key, per_rep in container._data.items():
            for rep_hash, arr in per_rep.items():
                if key.startswith("osc_blk_"):
                    # pre-blocked Pallas kernel geometry: the point axis is
                    # folded into a (rows, 128) layout, so leading-axis
                    # sharding would split the wrong dimension; replicate
                    # (the multi-device path propagates through the XLA
                    # kernel formulation, which uses the unblocked keys)
                    per_rep[rep_hash] = jax.device_put(
                        np.asarray(arr)
                        if not isinstance(arr, jax.Array)
                        else arr,
                        NamedSharding(mesh, P()),
                    )
                    continue
                if np.ndim(arr) >= 1 and arr.shape[0] % n != 0:
                    logging.debug(
                        "container %s key %s: leading axis %d not divisible"
                        " by %d devices; replicating",
                        container.name, key, arr.shape[0], n,
                    )
                per_rep[rep_hash] = _shard_array(arr, mesh, axis_name)
        # cached translation indices are per-event too: shard them the same
        # way so gathers stay local to each shard
        for cache_key, arr in container._flatidx.items():
            container._flatidx[cache_key] = _shard_array(
                arr, mesh, axis_name
            )


def build_batched_objective(
    compiled_template, data_dist, metric, mesh=None, axis_name="data",
    priors=True,
):
    """Batched objective over many parameter vectors at once — the TPU
    replacement for the reference's llh-server farm serving emcee walkers
    (``llh_server.py:64``): one vmapped evaluation, batch axis sharded
    across the mesh.

    Returns a jitted ``(B, n_free) -> (B,)`` callable (minimization sign
    convention, as :meth:`CompiledTemplate.build_objective`).
    """
    value_only, _ = compiled_template.build_objective(
        data_dist, metric, priors=priors
    )
    # raw (un-jitted) objective (vec, los, his, data): vmap over the walker
    # axis only; bounds and container data stay non-mapped arguments (so the
    # big event arrays are device buffers, not re-embedded constants)
    raw = value_only.raw

    batched = jax.vmap(raw, in_axes=(0, None, None, None))
    if mesh is None:
        jitted = jax.jit(batched)
    else:
        sharding = NamedSharding(mesh, P(axis_name, None))
        out_sharding = NamedSharding(mesh, P(axis_name))
        jitted = jax.jit(
            batched,
            in_shardings=(sharding, None, None, None),
            out_shardings=out_sharding,
        )

    def batched_objective(vecs):
        los, his = compiled_template._current_bounds()
        return jitted(
            jnp.asarray(vecs), jnp.asarray(los), jnp.asarray(his),
            compiled_template._data_vals,
        )

    return batched_objective
