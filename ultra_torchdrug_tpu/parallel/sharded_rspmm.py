"""Edge-partitioned relational SpMM: the multi-chip scaling path.

The reference replicates the full graph on every rank (SURVEY.md §2c); here the
edge list is sharded across the mesh's "edge" axis. Each chip aggregates its
local edge shard into a full [V, B, D] partial and partials are combined with
``psum`` over ICI. The custom VJP mirrors the single-chip op: d_input is the
transposed local SpMM (+psum), d_relation the local segment-by-relation SDDMM
(+psum) — so gradients are exact while every collective is an ICI all-reduce.

Usage: the conv layer routes here when an edge-sharded mesh is active
(parallel.mesh.use_mesh). Two bodies: ``sharded_rspmm`` (naive contiguous
edge split + full-accumulator psum, XLA segment ops — the fallback) and
``partitioned_rspmm_pallas`` (destination/source row-block partitioning
through the fused Pallas kernels — the production path; see the section
banner below). The O(V/n)-memory ring variant lives in ring_rspmm.py.
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.rspmm import _rspmm_xla


@lru_cache(maxsize=None)
def _make_sharded_rspmm(msg: str, num_nodes: int, mesh: Mesh, axis: str):
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
    *, msg: str, num_nodes: int, mesh: Mesh, axis: str = "edge",
):
    """AGG='add' edge-partitioned rspmm, XLA segment-op body. Edge arrays are
    padded here to a multiple of the edge-axis size with weight-0 edges
    (aggregation no-ops), so any E works. The Pallas production path is
    ``partitioned_rspmm_pallas`` (destination/source row-block partitioning,
    no full-tensor all-reduce)."""
    n = mesh.shape[axis]
    E = edge_index.shape[0]
    pad = (-E) % n
    if pad:
        edge_index = jnp.concatenate(
            [edge_index, jnp.zeros((pad, 2), edge_index.dtype)], 0
        )
        edge_type = jnp.concatenate(
            [edge_type, jnp.zeros((pad,), edge_type.dtype)], 0
        )
        edge_weight = jnp.concatenate(
            [edge_weight, jnp.zeros((pad,), edge_weight.dtype)], 0
        )
    fn = _make_sharded_rspmm(msg, int(num_nodes), mesh, axis)
    return fn(edge_index, edge_type, edge_weight, relation, x)


# ---------------------------------------------------------------------------
# Partitioned Pallas path: the production multi-chip design.
#
# Edges are partitioned by OUTPUT row block — destination blocks for the
# forward, source blocks for d_input — so each chip's kernel writes ONLY its
# own [V/n, B, D] block and no cross-chip reduction of node states is needed
# at all: the output is returned row-sharded (out_specs=P(axis)) and XLA
# all-gathers it lazily exactly where a consumer needs replicated rows.
# Compared to the naive edge-split + psum (2·V·B·D bytes/chip per op), this
# moves at most V·B·D bytes/chip (the all-gather half of an all-reduce) and
# skips even that when the consumer can use the sharded rows directly.
# Gathers stay local-HBM reads of the replicated x/g; the only true
# collective is a small [R, B·D] psum for d_relation. See
# parallel/DESIGN.md for the overlap/boundary-exchange roadmap.
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PartitionedRspmmLayouts:
    """Per-shard CSR layouts, stacked along a leading shard axis.

    fwd: CsrLayout stack [n, ...] — rows = dst - s·v_block (block-local),
         gather1 = global src into replicated x
    rev: CsrLayout stack — rows = src - s·v_block, gather1 = global dst into
         replicated g (the fused backward produces dx block + dr partial)
    rel: optional CsrLayout stack (transe d_relation; rows = etype)
    edge_id in every layout is GLOBAL, so per-batch edge weights stay one
    replicated [E] array re-gathered at call time (no sharded weight copies).
    """

    fwd: object
    rev: object
    rel: object = None
    # degree-balanced relabeling of the OUTPUT row space only (gathers read
    # the replicated x/g in original order): to_old [v_pad] new->original,
    # to_new [V] original->new; None for contiguous original-id blocks
    to_old: object = None
    to_new: object = None
    v_block: int = dataclasses.field(default=0, metadata=dict(static=True))
    n_shards: int = dataclasses.field(default=1, metadata=dict(static=True))
    num_nodes: int = dataclasses.field(default=0, metadata=dict(static=True))


def build_partitioned_rspmm_inputs(
    edge_index,
    edge_type,
    num_nodes: int,
    num_relations: int,
    n_shards: int,
    tile_rows: int = 256,
    tile_edges: int = 256,
    include_rel_layout: bool = False,
    balance="auto",
) -> PartitionedRspmmLayouts:
    """Host-side build of the per-shard layouts (one device_put at the end).

    Shard s owns output rows [s·v_block, (s+1)·v_block): forward layouts over
    edges whose dst lands in the block, reverse layouts over edges whose src
    does. Per-family chunk counts are padded to the max across shards so the
    stacks have uniform static shapes. balance: 'auto' relabels the output
    row space with a degree-balanced permutation (parallel/balance.py) when
    contiguous blocks are hub-imbalanced, equalizing per-chip kernel work;
    gathers keep reading the replicated x/g in original id order.
    """
    import numpy as np

    from ..ops.csr import _remap_edge_id, build_layout, pad_layout_chunks
    from .balance import degree_balanced_permutation, resolve_balance

    ei = np.asarray(edge_index)
    et = np.asarray(edge_type)
    src, dst = ei[:, 0], ei[:, 1]
    v_block = -(-num_nodes // n_shards)

    to_new = to_old = None
    row_src, row_dst = src, dst  # output-row keys (possibly relabeled)
    if resolve_balance(balance, src, dst, num_nodes, n_shards):
        to_new, to_old = degree_balanced_permutation(
            src, dst, num_nodes, n_shards
        )
        row_src, row_dst = to_new[src], to_new[dst]

    def family(row_key, gather_key, rows, rel_family=False):
        shards = []
        for s in range(n_shards):
            sel = np.nonzero(row_key // v_block == s)[0].astype(np.int32)
            if rel_family:
                lay = build_layout(
                    et[sel], src[sel], np.zeros(len(sel), np.int32),
                    num_relations, gather2_ids=dst[sel],
                    tile_rows=min(tile_rows, max(8, -(-num_relations // 8) * 8)),
                    tile_edges=tile_edges,
                )
            else:
                lay = build_layout(
                    row_key[sel] - s * v_block, gather_key[sel], et[sel],
                    rows, tile_rows=tile_rows, tile_edges=tile_edges,
                )
            if len(sel):
                lay = _remap_edge_id(lay, sel)
            shards.append(lay)
        cmax = max(l.num_chunks for l in shards)
        shards = [pad_layout_chunks(l, cmax) for l in shards]
        return jax.tree_util.tree_map(lambda *ls: np.stack(ls), *shards)

    fwd = family(row_dst, src, v_block)
    rev = family(row_src, dst, v_block)
    rel = family(row_src, dst, v_block, rel_family=True) if include_rel_layout else None
    return jax.device_put(
        PartitionedRspmmLayouts(
            fwd=fwd, rev=rev, rel=rel, to_old=to_old, to_new=to_new,
            v_block=v_block, n_shards=n_shards, num_nodes=int(num_nodes),
        )
    )


@lru_cache(maxsize=None)
def _make_partitioned_rspmm_pallas(
    msg: str, num_nodes: int, v_block: int, n_shards: int, mesh: Mesh,
    axis: str, compute_dtype: str = "float32",
):
    from ..ops.csr import RspmmLayouts
    from ..ops.rspmm_pallas import rspmm_bwd_pallas, rspmm_fwd_pallas

    espec = P(axis)
    rep = P()
    v_pad = v_block * n_shards

    def _pad_rows(arr):
        if arr.shape[0] == v_pad:
            return arr
        return jnp.concatenate(
            [arr, jnp.zeros((v_pad - arr.shape[0],) + arr.shape[1:], arr.dtype)], 0
        )

    cdtype = jnp.dtype(compute_dtype)

    def local_fwd(edge_weight, fwd_lay, relation, x):
        sq = jax.tree_util.tree_map(lambda a: a[0], fwd_lay)
        lay = RspmmLayouts(fwd=sq, rev=None)
        return rspmm_fwd_pallas(
            lay, edge_weight, relation, x, msg=msg, num_nodes=v_block,
            compute_dtype=cdtype,
        )

    fwd_sm = shard_map(
        local_fwd, mesh=mesh, in_specs=(rep, espec, rep, rep),
        out_specs=espec, check_vma=False,
    )

    def local_bwd(edge_weight, rev_lay, rel_lay, relation, x_pad, g):
        s = jax.lax.axis_index(axis)
        x_local = jax.lax.dynamic_slice_in_dim(x_pad, s * v_block, v_block, 0)
        sq_rev = jax.tree_util.tree_map(lambda a: a[0], rev_lay)
        sq_rel = (
            None if rel_lay is None
            else jax.tree_util.tree_map(lambda a: a[0], rel_lay)
        )
        lay = RspmmLayouts(fwd=None, rev=sq_rev, rel=sq_rel)
        dr, dx_local = rspmm_bwd_pallas(
            lay, edge_weight, relation, x_local, g, msg=msg,
            compute_dtype=cdtype,
        )
        return jax.lax.psum(dr, axis), dx_local

    bwd_sm = shard_map(
        local_bwd, mesh=mesh, in_specs=(rep, espec, espec, rep, rep, rep),
        out_specs=(rep, espec), check_vma=False,
    )

    @jax.custom_vjp
    def rspmm(edge_weight, layouts, relation, x):
        out = fwd_sm(edge_weight, layouts.fwd, relation, x)
        if layouts.to_new is not None:  # degree-balanced row space -> original
            return out[layouts.to_new]
        return out[:num_nodes]

    def vjp_fwd(edge_weight, layouts, relation, x):
        return rspmm(edge_weight, layouts, relation, x), (
            edge_weight, layouts, relation, x,
        )

    def vjp_bwd(res, g):
        edge_weight, layouts, relation, x = res
        x_pad = _pad_rows(x)
        if layouts.to_old is not None:
            # rev rows are src blocks of the relabeled space; gathers read
            # the replicated g in original order (layout gather ids global)
            x_pad = x_pad[layouts.to_old]
        dr, dx_pad = bwd_sm(
            edge_weight, layouts.rev, layouts.rel, relation, x_pad, g
        )
        if layouts.to_new is not None:
            dx = dx_pad[layouts.to_new]
            if dx.shape[0] < x.shape[0]:  # caller passed pre-padded rows
                dx = jnp.concatenate(
                    [dx, jnp.zeros((x.shape[0] - dx.shape[0],) + dx.shape[1:],
                                   dx.dtype)], 0,
                )
        else:
            dx = dx_pad[: x.shape[0]]

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


def partitioned_rspmm_pallas(
    edge_weight,
    layouts: PartitionedRspmmLayouts,
    relation,
    x,
    *,
    msg: str,
    mesh: Mesh,
    axis: str = "edge",
    compute_dtype: str = "float32",
):
    """AGG='add' rspmm through the fused Pallas kernels with destination/
    source row-block edge partitioning (see module banner). edge_weight is
    the replicated [E] per-batch weight vector; relation/x replicated; the
    output is returned row-sharded along `axis`."""
    fn = _make_partitioned_rspmm_pallas(
        msg, layouts.num_nodes, layouts.v_block, layouts.n_shards, mesh,
        axis, compute_dtype=str(compute_dtype),
    )
    return fn(edge_weight, layouts, relation, x)


