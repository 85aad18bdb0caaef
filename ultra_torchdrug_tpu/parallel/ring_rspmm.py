"""Ring-pipelined edge-partitioned rspmm: O(V/n) node-state memory per chip.

The other multi-chip paths (parallel/sharded_rspmm.py) keep node states
REPLICATED — every chip holds the full [V, B, D] x (and the all-gathered
output), so the largest reachable graph is bounded by one chip's HBM. This op
removes that bound, the boundary-exchange north star of SURVEY.md §2c (the
reference has no model-parallel story at all — it replicates the full graph
per GPU, /root/reference/ultra/engine.py:55-60):

  * x lives ROW-SHARDED over the mesh axis: chip s holds only block s
    ([V/n, B, D]); the output is produced row-sharded the same way.
  * Edges are bucketed host-side by (owner dst block, src block). The op runs
    n ring steps: at step k chip s holds x block (s-k) mod n, aggregates its
    bucket for that source block into its own output block with local XLA
    segment ops, and `ppermute`s the held block to its neighbor. Because the
    permuted block is only consumed one step later, XLA's async collectives
    overlap each transfer with the current step's aggregation — communication
    rides ICI behind compute.
  * n-1 permutes of [V/n, B·D] move the same total bytes as one all-gather of
    x, but no chip ever materializes more than TWO blocks (held + in-flight),
    so peak node-state memory per chip is O(V/n) instead of O(V).

Backward is the transposed ring: d_input owner s (src block s) rotates the
upstream gradient's dst blocks with the mirrored bucket family, producing dx
row-sharded; d_relation partials ride the same steps (the chip's own x block
is exactly what the SDDMM needs) and end in one [R, ...] psum — the only
non-ring collective, ~V/R smaller than any node-state tensor.

agg='add' (the configuration every shipped ULTRA config trains with) runs the
pipelined schedule above; agg='max'/'min' run the same ring with per-bucket
segment extrema combined associatively across steps (max of maxes), and an
argext backward on the transposed ring — the upstream gradient AND the saved
forward extremum rotate together, each chip testing its own x block's edges
for recompute-equality (the single-chip kernels' tied-edge convention,
ops/rspmm.py:_make_rspmm_minmax). That closes the PNA/max aggregation gap: a
pna conv under `ring` now routes all four statistics through ring schedules.
Weights stay one replicated [E] vector re-gathered by global edge_id, so
per-batch easy-edge masks need no sharded bookkeeping (CLAUDE.md layout
invariant).
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RingBuckets:
    """One direction's edge buckets: arrays [n, n, Emax] indexed
    [owner block, held block, edge]. `gather_local` indexes the rotating
    held block; `out_local` the owner's output block; `edge_id` is GLOBAL
    (weight re-gather); valid=0 marks padding."""

    gather_local: jnp.ndarray
    out_local: jnp.ndarray
    etype: jnp.ndarray
    edge_id: jnp.ndarray
    valid: jnp.ndarray


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RingRspmmInputs:
    fwd: RingBuckets  # owner = dst block, held/gather = src block (x ring)
    rev: RingBuckets  # owner = src block, held/gather = dst block (g ring)
    # optional per-bucket CSR layouts for running the fused Pallas kernels
    # inside each ring step (msg='mul'): CsrLayout pytrees with leaves
    # stacked [n_owner, n_held, ...]; edge_id global like the buckets'
    fwd_lay: object = None
    rev_lay: object = None
    # degree-balanced relabeling (parallel/balance.py): to_old [v_pad] maps
    # new row -> original (empty slots -> the zero pad row), to_new [V] maps
    # original -> new; None when blocks are contiguous original ids
    to_old: object = None
    to_new: object = None
    v_block: int = dataclasses.field(default=0, metadata=dict(static=True))
    n_shards: int = dataclasses.field(default=1, metadata=dict(static=True))
    num_nodes: int = dataclasses.field(default=0, metadata=dict(static=True))
    # permuted_io=True: the CALLER keeps node states in the padded block
    # domain ([n*v_block] rows, relabeled when balanced) for the whole
    # propagation — the op takes and returns block-domain arrays with NO
    # boundary gathers/pads, preserving O(V/n) row-sharded states across
    # layers (the model maps indices at its boundary scatter/readout instead)
    permuted_io: bool = dataclasses.field(default=False, metadata=dict(static=True))


def build_ring_rspmm_inputs(
    edge_index, edge_type, num_nodes: int, n_shards: int,
    pallas: bool = False, tile_rows: int = 256, tile_edges: int = 256,
    balance=False, permuted_io: bool = False,
) -> RingRspmmInputs:
    """Host-side bucket build (numpy; one device_put at the end).

    Buckets are padded to the max size over all (owner, held) pairs so the
    stacked arrays are static-shape. balance=True relabels node ids with a
    degree-balanced permutation (parallel/balance.py), equalizing per-chip
    edge work in every lockstep ring step and shrinking the bucket padding
    Emax — but the op then gathers states into/out of the relabeled order at
    its boundary, which REPLICATES full node states there and forfeits the
    O(V/n) memory contract between layers. Default off for that reason
    (unlike the replicated-x partitioned path, where 'auto' is free);
    enable when ring is chosen for compute balance rather than memory.
    The memory-preserving alternative is permuted_io=True: the caller owns
    the block domain end to end (see RingRspmmInputs.permuted_io), so the
    boundary gathers disappear, balance costs nothing, and 'auto' is the
    right setting — the model layer does this (models/nbfnet.py).

    pallas=True additionally builds per-bucket CSR layouts so the ring steps
    run the fused gather kernels (O(vb·F) memory per step) instead of XLA
    segment ops (which materialize the bucket's [Emax, ...] messages)."""
    from ..ops.csr import _remap_edge_id, build_layout, pad_layout_chunks
    from .balance import degree_balanced_permutation, resolve_balance

    ei = np.asarray(edge_index)
    et = np.asarray(edge_type, np.int32)
    src, dst = ei[:, 0].astype(np.int64), ei[:, 1].astype(np.int64)
    n = n_shards
    vb = -(-num_nodes // n)

    to_new = to_old = None
    if resolve_balance(balance, src, dst, num_nodes, n):
        to_new, to_old = degree_balanced_permutation(src, dst, num_nodes, n)
        src, dst = to_new[src].astype(np.int64), to_new[dst].astype(np.int64)

    def family(owner_key, held_key, gather_key, out_key):
        sel = [[None] * n for _ in range(n)]
        emax = 1
        for s in range(n):
            own = owner_key // vb == s
            for b in range(n):
                ids = np.nonzero(own & (held_key // vb == b))[0]
                sel[s][b] = ids
                emax = max(emax, len(ids))
        emax = -(-emax // 8) * 8
        g_l = np.zeros((n, n, emax), np.int32)
        o_l = np.zeros((n, n, emax), np.int32)
        ety = np.zeros((n, n, emax), np.int32)
        eid = np.zeros((n, n, emax), np.int32)
        val = np.zeros((n, n, emax), np.float32)
        for s in range(n):
            for b in range(n):
                ids = sel[s][b]
                m = len(ids)
                g_l[s, b, :m] = gather_key[ids] - b * vb
                o_l[s, b, :m] = out_key[ids] - s * vb
                ety[s, b, :m] = et[ids]
                eid[s, b, :m] = ids
                val[s, b, :m] = 1.0
        buckets = RingBuckets(
            gather_local=g_l, out_local=o_l, etype=ety, edge_id=eid, valid=val
        )
        if not pallas:
            return buckets, None
        lays = []
        for s in range(n):
            row = []
            for b in range(n):
                ids = sel[s][b]
                lay = build_layout(
                    (out_key[ids] - s * vb).astype(np.int32),
                    (gather_key[ids] - b * vb).astype(np.int32),
                    et[ids], vb,
                    tile_rows=min(tile_rows, max(8, -(-vb // 8) * 8)),
                    tile_edges=tile_edges,
                )
                if len(ids):
                    lay = _remap_edge_id(lay, ids.astype(np.int32))
                row.append(lay)
            lays.append(row)
        cmax = max(l.num_chunks for row in lays for l in row)
        lays = [[pad_layout_chunks(l, cmax) for l in row] for row in lays]
        stacked = jax.tree_util.tree_map(
            lambda *leaves: np.stack(leaves),
            *[jax.tree_util.tree_map(lambda *ls: np.stack(ls), *row)
              for row in lays],
        )
        return buckets, stacked

    fwd, fwd_lay = family(dst, src, src, dst)
    rev, rev_lay = family(src, dst, dst, src)
    return jax.device_put(
        RingRspmmInputs(
            fwd=fwd, rev=rev, fwd_lay=fwd_lay, rev_lay=rev_lay,
            to_old=to_old, to_new=to_new,
            v_block=vb, n_shards=n, num_nodes=int(num_nodes),
            permuted_io=permuted_io,
        )
    )


def _bucket_at(buckets: RingBuckets, b) -> RingBuckets:
    """Local [n, Emax] bucket stack -> the held-block-b slice (b traced)."""
    return jax.tree_util.tree_map(lambda a: a[b], buckets)


def _messages(relation, etype, rows, msg: str):
    """rows: gathered [E, ...] states; relation [R, D] or [R, B, D]."""
    if relation.ndim == 3:  # per-batch relation reps [R, B, D]
        rel_e = relation[etype]
    else:
        rel_e = relation[etype]
        if rows.ndim == 3:
            rel_e = rel_e[:, None, :]
    if msg == "mul":
        return rel_e * rows
    if msg == "add":
        return rel_e + rows
    raise ValueError(msg)


@lru_cache(maxsize=None)
def _make_rotate(axis: str, n: int, exchange: str):
    """Boundary transport for one ring step: shard s -> s+1 (mod n).
    'ppermute' = XLA collective (default; scheduler-overlapped);
    'rdma' = Pallas make_async_remote_copy push (parallel/rdma.py)."""
    perm = [(i, (i + 1) % n) for i in range(n)]
    if exchange == "rdma":
        from .rdma import rdma_rotate

        return lambda t: rdma_rotate(t, axis=axis, n_shards=n)
    assert exchange == "ppermute", exchange
    return lambda t: jax.lax.ppermute(t, axis, perm)


@lru_cache(maxsize=None)
def _make_ring_rspmm(
    msg: str, num_nodes: int, v_block: int, n_shards: int, mesh: Mesh,
    axis: str, use_pallas: bool = False, compute_dtype: str = "float32",
    exchange: str = "ppermute",
):
    cdtype = jnp.dtype(compute_dtype)
    espec = P(axis)
    rep = P()
    n = n_shards
    vb = v_block
    rotate = _make_rotate(axis, n, exchange)

    def _wshape(w, like):
        return w.reshape((-1,) + (1,) * (like.ndim - 1))

    def fwd_body(edge_weight, fwd_bk, fwd_lay, relation, x_blk):
        # shard_map local views: bucket stacks arrive [1, n, Emax] (leading
        # owner dim sharded away); x arrives as the bare [vb, ...] block
        bks = jax.tree_util.tree_map(lambda a: a[0], fwd_bk)
        s = jax.lax.axis_index(axis)
        x_rot = x_blk
        out = jnp.zeros((vb,) + x_rot.shape[1:], jnp.float32)
        for k in range(n):
            b = jax.lax.rem(s - k + n, n)
            if use_pallas:
                # fused gather kernel over this bucket's CSR layout:
                # O(vb·F) memory (no [Emax, ...] message materialization)
                from ..ops.csr import RspmmLayouts
                from ..ops.rspmm_pallas import rspmm_fwd_pallas

                lay_b = jax.tree_util.tree_map(lambda a: a[0][b], fwd_lay)
                out = out + rspmm_fwd_pallas(
                    RspmmLayouts(fwd=lay_b, rev=None), edge_weight,
                    relation, x_rot, msg=msg, num_nodes=vb,
                    compute_dtype=cdtype,
                )
            else:
                bk = _bucket_at(bks, b)
                w = edge_weight[bk.edge_id] * bk.valid
                m = _messages(relation, bk.etype, x_rot[bk.gather_local], msg)
                out = out + jax.ops.segment_sum(
                    m * _wshape(w, m), bk.out_local, num_segments=vb
                )
            if k + 1 < n:
                # consumed only next step: XLA overlaps the transfer with
                # this step's segment ops (async collectives)
                x_rot = rotate(x_rot)
        return out

    fwd_sm = shard_map(
        fwd_body, mesh=mesh, in_specs=(rep, espec, espec, rep, espec),
        out_specs=espec, check_vma=False,
    )

    def bwd_body(edge_weight, rev_bk, rev_lay, relation, x_blk, g_blk):
        bks = jax.tree_util.tree_map(lambda a: a[0], rev_bk)
        s = jax.lax.axis_index(axis)
        x_own = x_blk  # this chip's own x block: the SDDMM operand
        g_rot = g_blk
        dx = jnp.zeros((vb,) + x_own.shape[1:], jnp.float32)
        dr = None
        for k in range(n):
            b = jax.lax.rem(s - k + n, n)
            if use_pallas:
                from ..ops.csr import RspmmLayouts
                from ..ops.rspmm_pallas import rspmm_bwd_pallas

                lay_b = jax.tree_util.tree_map(lambda a: a[0][b], rev_lay)
                dr_p, dx_p = rspmm_bwd_pallas(
                    RspmmLayouts(fwd=None, rev=lay_b), edge_weight,
                    relation, x_own, g_rot, msg=msg, compute_dtype=cdtype,
                )
                dx = dx + dx_p
            else:
                bk = _bucket_at(bks, b)
                w = edge_weight[bk.edge_id] * bk.valid
                g_rows = g_rot[bk.gather_local]
                gw = g_rows * _wshape(w, g_rows)
                if msg == "mul":
                    if relation.ndim == 3:
                        rel_e = relation[bk.etype]
                    else:
                        rel_e = relation[bk.etype]
                        if gw.ndim == 3:
                            rel_e = rel_e[:, None, :]
                    dx_e = rel_e * gw
                    dr_e = x_own[bk.out_local] * gw
                else:  # transe: dmsg/dx = dmsg/drel = 1
                    dx_e = gw
                    dr_e = gw
                dx = dx + jax.ops.segment_sum(
                    dx_e, bk.out_local, num_segments=vb
                )
                dr_p = jax.ops.segment_sum(
                    dr_e, bk.etype, num_segments=relation.shape[0]
                )
            dr = dr_p if dr is None else dr + dr_p
            if k + 1 < n:
                g_rot = rotate(g_rot)
        if relation.ndim < dr.ndim:
            dr = dr.sum(axis=tuple(range(1, dr.ndim - relation.ndim + 1)))
        return jax.lax.psum(dr, axis), dx

    bwd_sm = shard_map(
        bwd_body, mesh=mesh, in_specs=(rep, espec, espec, rep, espec, espec),
        out_specs=(rep, espec), check_vma=False,
    )

    v_pad = vb * n

    def _pad_rows(arr):
        if arr.shape[0] == v_pad:
            return arr
        return jnp.concatenate(
            [arr, jnp.zeros((v_pad - arr.shape[0],) + arr.shape[1:], arr.dtype)],
            0,
        )

    def _to_blocks(inputs, arr):
        """Row-pad and, when degree-balanced, relabel into block order."""
        arr = _pad_rows(arr)
        return arr if inputs.to_old is None else arr[inputs.to_old]

    def _from_blocks(inputs, arr):
        if inputs.to_new is None:
            return arr[:num_nodes]
        return arr[inputs.to_new]

    @jax.custom_vjp
    def rspmm(edge_weight, inputs, relation, x):
        if inputs.permuted_io:
            # caller-owned block domain: x arrives [v_pad, ...] already in
            # block order; return the same — zero boundary gathers/pads
            assert x.shape[0] == v_pad, (x.shape, v_pad)
            return fwd_sm(
                edge_weight, inputs.fwd, inputs.fwd_lay, relation, x
            )
        out = fwd_sm(
            edge_weight, inputs.fwd, inputs.fwd_lay, relation,
            _to_blocks(inputs, x),
        )
        return _from_blocks(inputs, out)

    def vjp_fwd(edge_weight, inputs, relation, x):
        return rspmm(edge_weight, inputs, relation, x), (
            edge_weight, inputs, relation, x,
        )

    def _zeros_leaf(leaf):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            return jnp.zeros_like(leaf)
        return jnp.zeros(leaf.shape, dtype=jax.dtypes.float0)

    def vjp_bwd(res, g):
        edge_weight, inputs, relation, x = res
        if inputs.permuted_io:
            dr, dx = bwd_sm(
                edge_weight, inputs.rev, inputs.rev_lay, relation, x, g
            )
        else:
            dr, dx_pad = bwd_sm(
                edge_weight, inputs.rev, inputs.rev_lay, relation,
                _to_blocks(inputs, x), _to_blocks(inputs, g)
            )
            dx = _from_blocks(inputs, dx_pad)
            # match the caller's x rows (it may have passed pre-padded rows)
            if dx.shape[0] > x.shape[0]:
                dx = dx[: x.shape[0]]
            elif dx.shape[0] < x.shape[0]:
                dx = jnp.concatenate(
                    [dx, jnp.zeros((x.shape[0] - dx.shape[0],) + dx.shape[1:],
                                   dx.dtype)], 0,
                )
        return (
            jnp.zeros_like(edge_weight),
            jax.tree_util.tree_map(_zeros_leaf, inputs),
            dr,
            dx,
        )

    rspmm.defvjp(vjp_fwd, vjp_bwd)
    return rspmm


_BIG = 1e30


@lru_cache(maxsize=None)
def _make_ring_rspmm_minmax(
    msg: str, agg: str, num_nodes: int, v_block: int, n_shards: int,
    mesh: Mesh, axis: str, exchange: str = "ppermute",
):
    """Ring rspmm for AGG in {max, min}: forward combines per-bucket segment
    extrema across ring steps; backward rotates (g, out) through the
    transposed ring and flows gradient to every recompute-equal edge."""
    espec = P(axis)
    rep = P()
    n = n_shards
    vb = v_block
    rotate = _make_rotate(axis, n, exchange)
    is_max = agg == "max"
    seg = jax.ops.segment_max if is_max else jax.ops.segment_min
    combine = jnp.maximum if is_max else jnp.minimum
    neutral = -_BIG if is_max else _BIG

    def _wshape(w, like):
        return w.reshape((-1,) + (1,) * (like.ndim - 1))

    def fwd_body(edge_weight, fwd_bk, relation, x_blk):
        bks = jax.tree_util.tree_map(lambda a: a[0], fwd_bk)
        s = jax.lax.axis_index(axis)
        x_rot = x_blk
        out = jnp.full((vb,) + x_rot.shape[1:], neutral, jnp.float32)
        for k in range(n):
            b = jax.lax.rem(s - k + n, n)
            bk = _bucket_at(bks, b)
            w = edge_weight[bk.edge_id] * bk.valid
            m = _messages(relation, bk.etype, x_rot[bk.gather_local], msg)
            mw = m * _wshape(w, m)
            # padding edges must be neutral for extrema (w=0 alone would
            # inject value 0); real w=0 edges DO contribute 0, matching the
            # single-chip m*w-then-segment_max semantics
            mw = jnp.where(_wshape(bk.valid, mw) > 0, mw, neutral)
            part = seg(mw, bk.out_local, num_segments=vb)
            out = combine(out, part)
            if k + 1 < n:
                x_rot = rotate(x_rot)
        # empty rows -> 0, like the dense-fallback/pallas convention
        if is_max:
            return jnp.where(out <= -_BIG / 2, 0.0, out)
        return jnp.where(out >= _BIG / 2, 0.0, out)

    fwd_sm = shard_map(
        fwd_body, mesh=mesh, in_specs=(rep, espec, rep, espec),
        out_specs=espec, check_vma=False,
    )

    def bwd_body(edge_weight, rev_bk, relation, x_blk, g_blk, out_blk):
        bks = jax.tree_util.tree_map(lambda a: a[0], rev_bk)
        s = jax.lax.axis_index(axis)
        x_own = x_blk
        rot = (g_blk, out_blk)  # dst-indexed: rotate together
        dx = jnp.zeros((vb,) + x_own.shape[1:], jnp.float32)
        dr = None
        for k in range(n):
            b = jax.lax.rem(s - k + n, n)
            bk = _bucket_at(bks, b)
            w = edge_weight[bk.edge_id] * bk.valid
            g_rows = rot[0][bk.gather_local]
            out_rows = rot[1][bk.gather_local]
            x_rows = x_own[bk.out_local]
            if relation.ndim == 3:
                rel_e = relation[bk.etype]
            else:
                rel_e = relation[bk.etype]
                if g_rows.ndim == 3:
                    rel_e = rel_e[:, None, :]
            m = rel_e * x_rows if msg == "mul" else rel_e + x_rows
            mw = m * _wshape(w, m)
            # tied-edge convention: every recompute-equal edge gets gradient
            eq = (mw == out_rows).astype(jnp.float32)
            gw = g_rows * eq * _wshape(w, g_rows)
            dx_e = rel_e * gw if msg == "mul" else gw
            dr_e = x_rows * gw if msg == "mul" else gw
            dx = dx + jax.ops.segment_sum(dx_e, bk.out_local, num_segments=vb)
            dr_p = jax.ops.segment_sum(
                dr_e, bk.etype, num_segments=relation.shape[0]
            )
            dr = dr_p if dr is None else dr + dr_p
            if k + 1 < n:
                rot = rotate(rot)
        if relation.ndim < dr.ndim:
            dr = dr.sum(axis=tuple(range(1, dr.ndim - relation.ndim + 1)))
        return jax.lax.psum(dr, axis), dx

    bwd_sm = shard_map(
        bwd_body, mesh=mesh,
        in_specs=(rep, espec, rep, espec, espec, espec),
        out_specs=(rep, espec), check_vma=False,
    )

    v_pad = vb * n

    def _pad_rows(arr):
        if arr.shape[0] == v_pad:
            return arr
        return jnp.concatenate(
            [arr, jnp.zeros((v_pad - arr.shape[0],) + arr.shape[1:], arr.dtype)],
            0,
        )

    def _to_blocks(inputs, arr):
        arr = _pad_rows(arr)
        return arr if inputs.to_old is None else arr[inputs.to_old]

    def _from_blocks(inputs, arr):
        if inputs.to_new is None:
            return arr[:num_nodes]
        return arr[inputs.to_new]

    @jax.custom_vjp
    def rspmm(edge_weight, inputs, relation, x):
        if inputs.permuted_io:
            assert x.shape[0] == v_pad, (x.shape, v_pad)
            return fwd_sm(edge_weight, inputs.fwd, relation, x)
        out = fwd_sm(edge_weight, inputs.fwd, relation, _to_blocks(inputs, x))
        return _from_blocks(inputs, out)

    def vjp_fwd(edge_weight, inputs, relation, x):
        out = rspmm(edge_weight, inputs, relation, x)
        return out, (edge_weight, inputs, relation, x, out)

    def _zeros_leaf(leaf):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            return jnp.zeros_like(leaf)
        return jnp.zeros(leaf.shape, dtype=jax.dtypes.float0)

    def vjp_bwd(res, g):
        edge_weight, inputs, relation, x, out = res
        if inputs.permuted_io:
            dr, dx = bwd_sm(
                edge_weight, inputs.rev, relation, x, g, out
            )
        else:
            dr, dx_pad = bwd_sm(
                edge_weight, inputs.rev, relation,
                _to_blocks(inputs, x), _to_blocks(inputs, g),
                _to_blocks(inputs, out),
            )
            dx = _from_blocks(inputs, dx_pad)
            if dx.shape[0] > x.shape[0]:
                dx = dx[: x.shape[0]]
            elif dx.shape[0] < x.shape[0]:
                dx = jnp.concatenate(
                    [dx, jnp.zeros((x.shape[0] - dx.shape[0],) + dx.shape[1:],
                                   dx.dtype)], 0,
                )
        return (
            jnp.zeros_like(edge_weight),
            jax.tree_util.tree_map(_zeros_leaf, inputs),
            dr,
            dx,
        )

    rspmm.defvjp(vjp_fwd, vjp_bwd)
    return rspmm


@lru_cache(maxsize=None)
def _make_ring_rspmm_maxmin_pair(
    msg: str, num_nodes: int, v_block: int, n_shards: int,
    mesh: Mesh, axis: str, exchange: str = "ppermute",
):
    """Ring-level fused (max, min) pair — the ring analog of the single-chip
    generalized_rspmm_maxmin (ops/rspmm_pallas.py): pna's extrema issue
    together, and at ring level the expensive shared resource is the x
    BLOCK ROTATION, not just the message compute. One rotation + one
    message computation feed both extrema (two separate ring calls pay the
    n-1 ppermutes of [V/n, B*D] twice); the backward rotates the packed
    (g_max, out_max, g_min, out_min) planes through ONE transposed ring and
    shares the message recompute between both equality gates."""
    espec = P(axis)
    rep = P()
    n = n_shards
    vb = v_block
    rotate = _make_rotate(axis, n, exchange)

    def _wshape(w, like):
        return w.reshape((-1,) + (1,) * (like.ndim - 1))

    def fwd_body(edge_weight, fwd_bk, relation, x_blk):
        bks = jax.tree_util.tree_map(lambda a: a[0], fwd_bk)
        s = jax.lax.axis_index(axis)
        x_rot = x_blk
        omx = jnp.full((vb,) + x_rot.shape[1:], -_BIG, jnp.float32)
        omn = jnp.full((vb,) + x_rot.shape[1:], _BIG, jnp.float32)
        for k in range(n):
            b = jax.lax.rem(s - k + n, n)
            bk = _bucket_at(bks, b)
            w = edge_weight[bk.edge_id] * bk.valid
            m = _messages(relation, bk.etype, x_rot[bk.gather_local], msg)
            mw = m * _wshape(w, m)
            vmask = _wshape(bk.valid, mw) > 0
            omx = jnp.maximum(omx, jax.ops.segment_max(
                jnp.where(vmask, mw, -_BIG), bk.out_local, num_segments=vb))
            omn = jnp.minimum(omn, jax.ops.segment_min(
                jnp.where(vmask, mw, _BIG), bk.out_local, num_segments=vb))
            if k + 1 < n:
                x_rot = rotate(x_rot)
        return (jnp.where(omx <= -_BIG / 2, 0.0, omx),
                jnp.where(omn >= _BIG / 2, 0.0, omn))

    fwd_sm = shard_map(
        fwd_body, mesh=mesh, in_specs=(rep, espec, rep, espec),
        out_specs=(espec, espec), check_vma=False,
    )

    def bwd_body(edge_weight, rev_bk, relation, x_blk, gmx, omx, gmn, omn):
        bks = jax.tree_util.tree_map(lambda a: a[0], rev_bk)
        s = jax.lax.axis_index(axis)
        x_own = x_blk
        rot = (gmx, omx, gmn, omn)
        dx = jnp.zeros((vb,) + x_own.shape[1:], jnp.float32)
        dr = None
        for k in range(n):
            b = jax.lax.rem(s - k + n, n)
            bk = _bucket_at(bks, b)
            w = edge_weight[bk.edge_id] * bk.valid
            x_rows = x_own[bk.out_local]
            rel_e = relation[bk.etype]
            if relation.ndim != 3 and x_rows.ndim == 3:
                rel_e = rel_e[:, None, :]
            m = rel_e * x_rows if msg == "mul" else rel_e + x_rows
            mw = m * _wshape(w, m)
            gw = (rot[0][bk.gather_local]
                  * (mw == rot[1][bk.gather_local]).astype(jnp.float32)
                  + rot[2][bk.gather_local]
                  * (mw == rot[3][bk.gather_local]).astype(jnp.float32)
                  ) * _wshape(w, mw)
            dx_e = rel_e * gw if msg == "mul" else gw
            dr_e = x_rows * gw if msg == "mul" else gw
            dx = dx + jax.ops.segment_sum(dx_e, bk.out_local, num_segments=vb)
            dr_p = jax.ops.segment_sum(
                dr_e, bk.etype, num_segments=relation.shape[0])
            dr = dr_p if dr is None else dr + dr_p
            if k + 1 < n:
                rot = rotate(rot)
        if relation.ndim < dr.ndim:
            dr = dr.sum(axis=tuple(range(1, dr.ndim - relation.ndim + 1)))
        return jax.lax.psum(dr, axis), dx

    bwd_sm = shard_map(
        bwd_body, mesh=mesh,
        in_specs=(rep, espec, rep) + (espec,) * 5,
        out_specs=(rep, espec), check_vma=False,
    )

    v_pad = vb * n

    def _pad_rows(arr):
        if arr.shape[0] == v_pad:
            return arr
        return jnp.concatenate(
            [arr, jnp.zeros((v_pad - arr.shape[0],) + arr.shape[1:],
                            arr.dtype)], 0)

    def _to_blocks(inputs, arr):
        arr = _pad_rows(arr)
        return arr if inputs.to_old is None else arr[inputs.to_old]

    def _from_blocks(inputs, arr):
        if inputs.to_new is None:
            return arr[:num_nodes]
        return arr[inputs.to_new]

    @jax.custom_vjp
    def rspmm_pair(edge_weight, inputs, relation, x):
        if inputs.permuted_io:
            assert x.shape[0] == v_pad, (x.shape, v_pad)
            return fwd_sm(edge_weight, inputs.fwd, relation, x)
        mx, mn = fwd_sm(edge_weight, inputs.fwd, relation,
                        _to_blocks(inputs, x))
        return _from_blocks(inputs, mx), _from_blocks(inputs, mn)

    def vjp_fwd(edge_weight, inputs, relation, x):
        out = rspmm_pair(edge_weight, inputs, relation, x)
        return out, (edge_weight, inputs, relation, x, out)

    def _zeros_leaf(leaf):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            return jnp.zeros_like(leaf)
        return jnp.zeros(leaf.shape, dtype=jax.dtypes.float0)

    def vjp_bwd(res, g):
        edge_weight, inputs, relation, x, (omx, omn) = res
        gmx, gmn = g
        if inputs.permuted_io:
            dr, dx = bwd_sm(edge_weight, inputs.rev, relation, x,
                            gmx, omx, gmn, omn)
        else:
            dr, dx_pad = bwd_sm(
                edge_weight, inputs.rev, relation, _to_blocks(inputs, x),
                _to_blocks(inputs, gmx), _to_blocks(inputs, omx),
                _to_blocks(inputs, gmn), _to_blocks(inputs, omn),
            )
            dx = _from_blocks(inputs, dx_pad)
            if dx.shape[0] > x.shape[0]:
                dx = dx[: x.shape[0]]
            elif dx.shape[0] < x.shape[0]:
                dx = jnp.concatenate(
                    [dx, jnp.zeros((x.shape[0] - dx.shape[0],) + dx.shape[1:],
                                   dx.dtype)], 0)
        return (jnp.zeros_like(edge_weight),
                jax.tree_util.tree_map(_zeros_leaf, inputs), dr, dx)

    rspmm_pair.defvjp(vjp_fwd, vjp_bwd)
    return rspmm_pair


@lru_cache(maxsize=None)
def _make_ring_rspmm_addsq(
    num_nodes: int, v_block: int, n_shards: int,
    mesh: Mesh, axis: str, exchange: str = "ppermute",
):
    """Ring-level fused (sum, sum-of-squares) pair for the distmult pna
    moments: one x rotation and one message computation feed both
    accumulators (the two-call form rotates x twice AND materializes
    rel^2/x^2 copies). Backward rotates (g_s, g_sq) together; both
    gradients factor through one inner term w*g_s + 2*msg*w*g_sq, like
    the single-chip fused kernel (ops/rspmm_pallas.py addsq)."""
    espec = P(axis)
    rep = P()
    n = n_shards
    vb = v_block
    rotate = _make_rotate(axis, n, exchange)

    def _wshape(w, like):
        return w.reshape((-1,) + (1,) * (like.ndim - 1))

    def fwd_body(edge_weight, fwd_bk, relation, x_blk):
        bks = jax.tree_util.tree_map(lambda a: a[0], fwd_bk)
        s = jax.lax.axis_index(axis)
        x_rot = x_blk
        os_ = jnp.zeros((vb,) + x_rot.shape[1:], jnp.float32)
        oq = jnp.zeros((vb,) + x_rot.shape[1:], jnp.float32)
        for k in range(n):
            b = jax.lax.rem(s - k + n, n)
            bk = _bucket_at(bks, b)
            w = edge_weight[bk.edge_id] * bk.valid
            m = _messages(relation, bk.etype, x_rot[bk.gather_local], "mul")
            mw = m * _wshape(w, m)
            os_ = os_ + jax.ops.segment_sum(mw, bk.out_local, num_segments=vb)
            oq = oq + jax.ops.segment_sum(
                m * mw, bk.out_local, num_segments=vb)
            if k + 1 < n:
                x_rot = rotate(x_rot)
        return os_, oq

    fwd_sm = shard_map(
        fwd_body, mesh=mesh, in_specs=(rep, espec, rep, espec),
        out_specs=(espec, espec), check_vma=False,
    )

    def bwd_body(edge_weight, rev_bk, relation, x_blk, gs, gq):
        bks = jax.tree_util.tree_map(lambda a: a[0], rev_bk)
        s = jax.lax.axis_index(axis)
        x_own = x_blk
        rot = (gs, gq)
        dx = jnp.zeros((vb,) + x_own.shape[1:], jnp.float32)
        dr = None
        for k in range(n):
            b = jax.lax.rem(s - k + n, n)
            bk = _bucket_at(bks, b)
            w = edge_weight[bk.edge_id] * bk.valid
            x_rows = x_own[bk.out_local]
            rel_e = relation[bk.etype]
            if relation.ndim != 3 and x_rows.ndim == 3:
                rel_e = rel_e[:, None, :]
            m = rel_e * x_rows
            wv = _wshape(w, m)
            inner = rot[0][bk.gather_local] * wv \
                + (2.0 * m) * (rot[1][bk.gather_local] * wv)
            dx = dx + jax.ops.segment_sum(
                rel_e * inner, bk.out_local, num_segments=vb)
            dr_p = jax.ops.segment_sum(
                x_rows * inner, bk.etype, num_segments=relation.shape[0])
            dr = dr_p if dr is None else dr + dr_p
            if k + 1 < n:
                rot = rotate(rot)
        if relation.ndim < dr.ndim:
            dr = dr.sum(axis=tuple(range(1, dr.ndim - relation.ndim + 1)))
        return jax.lax.psum(dr, axis), dx

    bwd_sm = shard_map(
        bwd_body, mesh=mesh,
        in_specs=(rep, espec, rep) + (espec,) * 3,
        out_specs=(rep, espec), check_vma=False,
    )

    v_pad = vb * n

    def _pad_rows(arr):
        if arr.shape[0] == v_pad:
            return arr
        return jnp.concatenate(
            [arr, jnp.zeros((v_pad - arr.shape[0],) + arr.shape[1:],
                            arr.dtype)], 0)

    def _to_blocks(inputs, arr):
        arr = _pad_rows(arr)
        return arr if inputs.to_old is None else arr[inputs.to_old]

    def _from_blocks(inputs, arr):
        if inputs.to_new is None:
            return arr[:num_nodes]
        return arr[inputs.to_new]

    @jax.custom_vjp
    def rspmm_pair(edge_weight, inputs, relation, x):
        if inputs.permuted_io:
            assert x.shape[0] == v_pad, (x.shape, v_pad)
            return fwd_sm(edge_weight, inputs.fwd, relation, x)
        s_, q_ = fwd_sm(edge_weight, inputs.fwd, relation,
                        _to_blocks(inputs, x))
        return _from_blocks(inputs, s_), _from_blocks(inputs, q_)

    def vjp_fwd(edge_weight, inputs, relation, x):
        out = rspmm_pair(edge_weight, inputs, relation, x)
        return out, (edge_weight, inputs, relation, x)

    def _zeros_leaf(leaf):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            return jnp.zeros_like(leaf)
        return jnp.zeros(leaf.shape, dtype=jax.dtypes.float0)

    def vjp_bwd(res, g):
        edge_weight, inputs, relation, x = res
        gs, gq = g
        if inputs.permuted_io:
            dr, dx = bwd_sm(edge_weight, inputs.rev, relation, x, gs, gq)
        else:
            dr, dx_pad = bwd_sm(
                edge_weight, inputs.rev, relation, _to_blocks(inputs, x),
                _to_blocks(inputs, gs), _to_blocks(inputs, gq),
            )
            dx = _from_blocks(inputs, dx_pad)
            if dx.shape[0] > x.shape[0]:
                dx = dx[: x.shape[0]]
            elif dx.shape[0] < x.shape[0]:
                dx = jnp.concatenate(
                    [dx, jnp.zeros((x.shape[0] - dx.shape[0],) + dx.shape[1:],
                                   dx.dtype)], 0)
        return (jnp.zeros_like(edge_weight),
                jax.tree_util.tree_map(_zeros_leaf, inputs), dr, dx)

    rspmm_pair.defvjp(vjp_fwd, vjp_bwd)
    return rspmm_pair


def ring_rspmm_maxmin(edge_weight, inputs: RingRspmmInputs, relation, x, *,
                      msg: str, mesh: Mesh, axis: str = "edge",
                      exchange: str = "ppermute"):
    """Fused (max, min) over one ring rotation — see
    _make_ring_rspmm_maxmin_pair."""
    fn = _make_ring_rspmm_maxmin_pair(
        msg, inputs.num_nodes, inputs.v_block, inputs.n_shards, mesh, axis,
        exchange=exchange,
    )
    return fn(edge_weight, inputs, relation, x)


def ring_rspmm_addsq(edge_weight, inputs: RingRspmmInputs, relation, x, *,
                     mesh: Mesh, axis: str = "edge",
                     exchange: str = "ppermute"):
    """Fused (sum, sum-of-squares) over one ring rotation (distmult) — see
    _make_ring_rspmm_addsq."""
    fn = _make_ring_rspmm_addsq(
        inputs.num_nodes, inputs.v_block, inputs.n_shards, mesh, axis,
        exchange=exchange,
    )
    return fn(edge_weight, inputs, relation, x)


def ring_rspmm(
    edge_weight,
    inputs: RingRspmmInputs,
    relation,
    x,
    *,
    msg: str,
    agg: str = "add",
    mesh: Mesh,
    axis: str = "edge",
    compute_dtype: str = "float32",
    exchange: str = "ppermute",
):
    """Ring-pipelined row-sharded rspmm (module banner). edge_weight:
    replicated [E]; relation replicated; x [V, ...] (consumed row-sharded
    along `axis`; a replicated x is sliced on entry). Returns [V, ...]
    row-sharded the same way. agg: 'add' (pipelined sums; when the inputs
    carry per-bucket CSR layouts — build_ring_rspmm_inputs(pallas=True) —
    and msg='mul', each step runs the fused Pallas kernels instead of XLA
    segment ops, with compute_dtype like the single-chip op) or 'max'/'min'
    (associative extrema combine + argext backward). exchange: 'ppermute'
    (default XLA collective) or 'rdma' (Pallas make_async_remote_copy
    boundary exchange, parallel/rdma.py)."""
    if agg in ("max", "min"):
        fn = _make_ring_rspmm_minmax(
            msg, agg, inputs.num_nodes, inputs.v_block, inputs.n_shards,
            mesh, axis, exchange=exchange,
        )
        return fn(edge_weight, inputs, relation, x)
    assert agg == "add", agg
    use_pallas = inputs.fwd_lay is not None and msg == "mul"
    fn = _make_ring_rspmm(
        msg, inputs.num_nodes, inputs.v_block, inputs.n_shards, mesh, axis,
        use_pallas=use_pallas, compute_dtype=str(compute_dtype),
        exchange=exchange,
    )
    return fn(edge_weight, inputs, relation, x)
