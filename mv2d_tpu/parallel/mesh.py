"""Device-mesh data parallelism (the reference's only parallelism axis).

Replaces torch.distributed DDP/NCCL (ref: configs/_base_/default_runtime.py:13,
tools/dist_train.sh) with jax.sharding: a 1-axis 'data' Mesh, batch sharded
over it, parameters replicated; XLA inserts the gradient all-reduce over
ICI/DCN.  The reference's in-model `reduce_mean` loss normalizers
(cross_attention_head.py:407,420) become global means over the sharded batch,
which jit computes with the same collectives.

Multi-host: call `jax.distributed.initialize()` before `make_mesh()` (the
tools/train.py CLI does this when JAX_COORDINATOR is set).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = 'data') -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def batch_sharding(mesh: Mesh, axis: str = 'data') -> NamedSharding:
    """Leading-axis sharding for batched pytrees."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any, axis: str = 'data') -> Any:
    """Place a batched pytree onto the mesh.

    Single-process: `batch` leading dim = global batch, device_put scatters
    it.  Multi-process (jax.distributed): each process passes its LOCAL
    slice (leading dim = local batch = its addressable mesh devices), and
    the result is the distributed global array (the host-sharded loading
    that replaces the reference's DistributedGroupSampler)."""
    sh = batch_sharding(mesh, axis)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sh, np.asarray(x)), batch)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def make_dp_train_step(model, tx, mesh: Mesh, axis: str = 'data',
                       mixed_precision: bool = True):
    """Data-parallel train step over a batched TrainBatch (leading dim B).

    Parameters replicated, batch sharded on `axis`; per-sample losses from
    train_step.compute_losses are averaged globally.  The 3D bbox losses
    use the reference's SYNCED normalizer (cross_attention_head.py:419-420:
    reduce_mean of num_pos across GPUs, clamped at 1): compute_losses
    returns them as raw (sum, num_pos) pairs and the global mean factor is
    applied here — E[l]/E[n], not E[l/n].

    Per-scene work runs as a sequential lax.map over each device's LOCAL
    shard (shard_map) rather than a batched vmap: the scan body is the
    same batch-1 program regardless of mesh size, so per-scene numerics
    are BIT-IDENTICAL between dp1 and dpN and the only cross-sharding
    difference is the order of the final grad/metric summations (~1 ulp).
    A batched vmap lowers differently at different local batch sizes
    (conv algorithms/fusions pick per-shape), which made dp8-vs-dp1 drift
    up to ~0.5% through matching-tie flips; it also buys nothing here —
    scenes are 12-view programs with no useful cross-scene fusion, and
    the production recipe runs one scene per device anyway.
    """
    from ..train.train_step import TrainState, compute_losses

    def step(state: TrainState, batch, rng: jax.Array):
        B = jax.tree.leaves(batch)[0].shape[0]

        def loss_fn(params):
            variables = {'params': params, 'constants': state.constants}
            rngs = jax.random.split(rng, B)

            def one(b, r):
                return compute_losses(model, variables, b, r,
                                      mixed_precision=mixed_precision,
                                      sync_bbox_norm=True)

            def local(batch_l, rngs_l):
                if rngs_l.shape[0] == 1:
                    # one scene per device (the production recipe): a
                    # direct call, not a trip-1 scan - compiles much
                    # faster and lowers bit-identically to the scan body
                    # (measured on the CPU backend)
                    out = one(jax.tree.map(lambda x: x[0], batch_l),
                              rngs_l[0])
                    return jax.tree.map(lambda x: x[None], out)
                return jax.lax.map(lambda a: one(*a), (batch_l, rngs_l))

            totals, metrics, deferred = jax.shard_map(
                local, mesh=mesh,
                in_specs=(P(axis), P(axis)), out_specs=P(axis),
                check_vma=False)(batch, rngs)
            total = totals.mean()
            metrics = jax.tree.map(jnp.mean, metrics)
            for k, (s, f) in deferred.items():
                v = s.mean() / jnp.maximum(f.mean(), 1.0)
                total = total + v
                metrics[k] = v
            return total, metrics

        (total, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        import optax
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics['total_loss'] = total
        return TrainState(params=params, constants=state.constants,
                          opt_state=opt_state, step=state.step + 1), metrics

    rep = replicated(mesh)
    data = batch_sharding(mesh, axis)
    return jax.jit(step,
                   in_shardings=(rep, data, rep),
                   out_shardings=(rep, rep),
                   donate_argnums=(0,))
