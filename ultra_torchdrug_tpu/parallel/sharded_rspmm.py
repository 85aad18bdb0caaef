"""Edge-partitioned relational SpMM: the multi-chip scaling path.

The reference replicates the full graph on every rank (SURVEY.md §2c); here the
edge list is sharded across the mesh's "edge" axis. Each chip aggregates its
local edge shard into a full [V, B, D] partial and partials are combined with
``psum`` over ICI. The custom VJP mirrors the single-chip op: d_input is the
transposed local SpMM (+psum), d_relation the local segment-by-relation SDDMM
(+psum) — so gradients are exact while every collective is an ICI all-reduce.

Usage: the conv layer routes here when an edge-sharded mesh is active
(parallel.mesh.use_mesh). The shard_map body currently runs the XLA
segment-op implementation; running the Pallas kernel per shard (with
per-shard CSR layouts) is the planned path once multi-chip hardware is
available to validate it.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.rspmm import _rspmm_xla


@lru_cache(maxsize=None)
def _make_sharded_rspmm(msg: str, num_nodes: int, mesh: Mesh, axis: str, impl: str):
    """Edge-sharded rspmm with custom VJP; cached for stable jit identity."""
    espec = P(axis)
    rep = P()

    def local_fwd(edge_index, edge_type, edge_weight, relation, x):
        partial = _rspmm_xla(
            edge_index, edge_type, edge_weight, relation, x,
            msg=msg, agg="add", num_nodes=num_nodes,
        )
        return jax.lax.psum(partial, axis)

    fwd_sm = shard_map(
        local_fwd,
        mesh=mesh,
        in_specs=(espec, espec, espec, rep, rep),
        out_specs=rep,
        check_vma=False,
    )

    def local_bwd(edge_index, edge_type, edge_weight, relation, x, g):
        rev = edge_index[:, ::-1]
        dx = _rspmm_xla(
            rev, edge_type, edge_weight, relation, g,
            msg="mul" if msg == "mul" else "none",
            agg="add", num_nodes=x.shape[0],
        )
        src, dst = edge_index[:, 0], edge_index[:, 1]
        dr_e = x[src] * g[dst] if msg == "mul" else g[dst]
        wshape = (-1,) + (1,) * (dr_e.ndim - 1)
        dr = jax.ops.segment_sum(
            dr_e * edge_weight.reshape(wshape), edge_type,
            num_segments=relation.shape[0],
        )
        if relation.ndim < dr.ndim:
            dr = dr.sum(axis=tuple(range(1, dr.ndim - relation.ndim + 1)))
        return jax.lax.psum(dr, axis), jax.lax.psum(dx, axis)

    bwd_sm = shard_map(
        local_bwd,
        mesh=mesh,
        in_specs=(espec, espec, espec, rep, rep, rep),
        out_specs=(rep, rep),
        check_vma=False,
    )

    @jax.custom_vjp
    def rspmm(edge_index, edge_type, edge_weight, relation, x):
        return fwd_sm(edge_index, edge_type, edge_weight, relation, x)

    def vjp_fwd(edge_index, edge_type, edge_weight, relation, x):
        out = fwd_sm(edge_index, edge_type, edge_weight, relation, x)
        return out, (edge_index, edge_type, edge_weight, relation, x)

    def vjp_bwd(res, g):
        edge_index, edge_type, edge_weight, relation, x = res
        dr, dx = bwd_sm(edge_index, edge_type, edge_weight, relation, x, g)
        zero_i = jnp.zeros(edge_index.shape, dtype=jax.dtypes.float0)
        zero_t = jnp.zeros(edge_type.shape, dtype=jax.dtypes.float0)
        return zero_i, zero_t, jnp.zeros_like(edge_weight), dr, dx

    rspmm.defvjp(vjp_fwd, vjp_bwd)
    return rspmm


def sharded_rspmm(
    edge_index, edge_type, edge_weight, relation, x,
    *, msg: str, num_nodes: int, mesh: Mesh, axis: str = "edge", impl: str = "xla",
):
    """AGG='add' edge-partitioned rspmm. Edge arrays must be divisible by the
    edge-axis size (pad with weight-0 edges)."""
    fn = _make_sharded_rspmm(msg, int(num_nodes), mesh, axis, impl)
    return fn(edge_index, edge_type, edge_weight, relation, x)


# ---------------------------------------------------------------------------
# Pallas-per-shard variant: each chip runs the fused rspmm kernels over its
# OWN edge shard (with its own CSR layouts), then partials are psum'd. This is
# the production multi-chip path: local gathers ride HBM, the only collective
# is the [V, B, D] all-reduce over ICI.
# ---------------------------------------------------------------------------


def build_sharded_rspmm_inputs(
    edge_index,
    edge_type,
    edge_weight,
    num_nodes: int,
    num_relations: int,
    n_shards: int,
    tile_rows: int = 256,
    tile_edges: int = 256,
):
    """Split the edge list into n contiguous shards (padded with weight-0
    edges) and build per-shard CSR layouts, stacked along a leading shard
    axis so shard_map can scatter them with PartitionSpec(axis).

    Returns (edges [n, Es, 2], types [n, Es], weights [n, Es],
             stacked RspmmLayouts pytree with leading dim n).
    """
    import numpy as np

    from ..ops.csr import build_rspmm_layouts

    ei = np.asarray(edge_index)
    et = np.asarray(edge_type)
    ew = np.asarray(edge_weight)
    E = len(ei)
    Es = -(-E // n_shards)
    pad = Es * n_shards - E
    if pad:
        ei = np.concatenate([ei, np.zeros((pad, 2), ei.dtype)], 0)
        et = np.concatenate([et, np.zeros(pad, et.dtype)], 0)
        ew = np.concatenate([ew, np.zeros(pad, ew.dtype)], 0)
    ei = ei.reshape(n_shards, Es, 2)
    et = et.reshape(n_shards, Es)
    ew = ew.reshape(n_shards, Es)
    per_shard = [
        build_rspmm_layouts(ei[s], et[s], num_nodes, num_relations,
                            tile_rows=tile_rows, tile_edges=tile_edges)
        for s in range(n_shards)
    ]
    stacked = jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves), *per_shard
    )
    return jnp.asarray(ei), jnp.asarray(et), jnp.asarray(ew), stacked


@lru_cache(maxsize=None)
def _make_sharded_rspmm_pallas(msg: str, num_nodes: int, mesh: Mesh, axis: str):
    espec = P(axis)
    rep = P()

    def local_fwd(edge_weight, layouts, relation, x):
        from ..ops.rspmm_pallas import rspmm_fwd_pallas

        squeeze = jax.tree_util.tree_map(lambda a: a[0], layouts)
        partial = rspmm_fwd_pallas(
            squeeze, edge_weight[0], relation, x, msg=msg, num_nodes=num_nodes
        )
        return jax.lax.psum(partial, axis)

    def local_bwd(edge_weight, layouts, relation, x, g):
        from ..ops.rspmm_pallas import rspmm_bwd_pallas

        squeeze = jax.tree_util.tree_map(lambda a: a[0], layouts)
        dr, dx = rspmm_bwd_pallas(
            squeeze, edge_weight[0], relation, x, g, msg=msg
        )
        return jax.lax.psum(dr, axis), jax.lax.psum(dx, axis)

    fwd_sm = shard_map(
        local_fwd, mesh=mesh, in_specs=(espec, espec, rep, rep),
        out_specs=rep, check_vma=False,
    )
    bwd_sm = shard_map(
        local_bwd, mesh=mesh, in_specs=(espec, espec, rep, rep, rep),
        out_specs=(rep, rep), check_vma=False,
    )

    @jax.custom_vjp
    def rspmm(edge_weight, layouts, relation, x):
        return fwd_sm(edge_weight, layouts, relation, x)

    def vjp_fwd(edge_weight, layouts, relation, x):
        return fwd_sm(edge_weight, layouts, relation, x), (
            edge_weight, layouts, relation, x,
        )

    def vjp_bwd(res, g):
        edge_weight, layouts, relation, x = res
        dr, dx = bwd_sm(edge_weight, layouts, relation, x, g)

        def zeros(leaf):
            if jnp.issubdtype(leaf.dtype, jnp.floating):
                return jnp.zeros_like(leaf)
            return jnp.zeros(leaf.shape, dtype=jax.dtypes.float0)

        return (
            jnp.zeros_like(edge_weight),
            jax.tree_util.tree_map(zeros, layouts),
            dr,
            dx,
        )

    rspmm.defvjp(vjp_fwd, vjp_bwd)
    return rspmm


def sharded_rspmm_pallas(
    edge_weight_sharded,
    stacked_layouts,
    relation,
    x,
    *,
    msg: str,
    num_nodes: int,
    mesh: Mesh,
    axis: str = "edge",
):
    """Edge-partitioned rspmm with the fused Pallas kernels per shard.
    Inputs from build_sharded_rspmm_inputs (weights [n, Es] + stacked
    layouts); relation/x replicated."""
    fn = _make_sharded_rspmm_pallas(msg, int(num_nodes), mesh, axis)
    return fn(edge_weight_sharded, stacked_layouts, relation, x)
