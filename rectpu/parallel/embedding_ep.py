"""EP (embedding-parallel) lookup: row-sharded tables on the 'model' axis.

This is the TPU-native replacement for the reference's parameter-server role
(embedding variables hosted on PS, SURVEY.md §2c): the unified embedding table
[V, K] is row-sharded across the 'model' mesh axis; ids arrive sharded across
the 'data' axis. Each device masks ids to its local row range, gathers
locally, and a single psum over 'model' (riding ICI) assembles the full
[B/d, F, K] activations per data shard. Autodiff through shard_map yields the
reverse path for free: the table cotangent is the local scatter-add psum'd
over 'data' — exactly the DLRM-style sparse gradient exchange.

For this model family F*K is small (26*4 .. 26*64 floats per example), so the
masked-gather+psum exchange is bandwidth-cheap; an id-deduplicating all_to_all
variant is the planned optimization for very wide K (SURVEY.md §7 step 5).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from rectpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def make_ep_lookup_2d(mesh: Mesh):
    """2D sparse-parallel lookup (the DLRM pattern, SURVEY.md §2c).

    The batch is sharded over ALL devices — P(('data','model')) on the batch
    dim — so the dense towers run data-parallel across the whole mesh (the
    1D variant duplicates tower compute across the 'model' axis). The table
    stays row-sharded over 'model'. Exchange per shard_map instance:

        all_gather ids over 'model'      [B/dm, F] -> [B/d, F]   (cheap ints)
        mask + local gather              -> partial [B/d, F, K]
        reduce_scatter over 'model'      -> exact   [B/dm, F, K]

    reduce_scatter moves half the bytes of the psum in the 1D variant and
    returns activations already in the 2D batch layout. Autodiff reverses it
    (all_gather of cotangents, local scatter-add, psum of table grads over
    'data') for free.
    """

    def local_lookup(table_shard, ids_local):
        # table_shard: [V/m, K]; ids_local: [B/(d*m), F] of GLOBAL row ids
        ids_full = jax.lax.all_gather(
            ids_local.astype(jnp.int32), MODEL_AXIS, axis=0, tiled=True
        )  # [B/d, F]
        m = jax.lax.axis_index(MODEL_AXIS)
        v_shard = table_shard.shape[0]
        local = ids_full - m * v_shard
        in_range = (local >= 0) & (local < v_shard)
        safe = jnp.where(in_range, local, 0)
        emb = jnp.take(table_shard, safe, axis=0)  # [B/d, F, K]
        emb = jnp.where(in_range[..., None], emb, jnp.zeros_like(emb))
        # sum partials across table shards AND return this device's batch slice
        return jax.lax.psum_scatter(emb, MODEL_AXIS, scatter_dimension=0, tiled=True)

    def lookup(table, ids):
        return shard_map(
            local_lookup,
            mesh=mesh,
            in_specs=(P(MODEL_AXIS, None), P((DATA_AXIS, MODEL_AXIS), None)),
            out_specs=P((DATA_AXIS, MODEL_AXIS), None, None),
        )(table, ids)

    return lookup


def make_ep_lookup(mesh: Mesh):
    """Return lookup_fn(table, ids) for a 'model'-row-sharded table and
    'data'-sharded ids; output is 'data'-sharded [B, F, K] activations."""

    def local_lookup(table_shard, ids_local):
        # table_shard: [V/m, K]; ids_local: [B/d, F] of GLOBAL row ids
        m = jax.lax.axis_index(MODEL_AXIS)
        v_shard = table_shard.shape[0]
        local = ids_local.astype(jnp.int32) - m * v_shard
        in_range = (local >= 0) & (local < v_shard)
        safe = jnp.where(in_range, local, 0)
        emb = jnp.take(table_shard, safe, axis=0)  # [B/d, F, K]
        emb = jnp.where(in_range[..., None], emb, jnp.zeros_like(emb))
        # assemble full activations across table shards (ICI collective)
        return jax.lax.psum(emb, MODEL_AXIS)

    def lookup(table, ids):
        return shard_map(
            local_lookup,
            mesh=mesh,
            in_specs=(P(MODEL_AXIS, None), P(DATA_AXIS, None)),
            out_specs=P(DATA_AXIS, None, None),
        )(table, ids)

    return lookup
