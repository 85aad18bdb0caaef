"""Host-side CSR-style edge layouts for the Pallas rspmm kernels.

The kernel consumes edges sorted by an output-row key (destination node for
the forward pass, source node for d_input, relation id for d_relation),
chunked into fixed-size groups that each touch exactly one output row tile.
Chunk alignment inserts weight-0 padding edges, so the layout is a pure
function of graph *topology* — per-batch edge weights (easy-edge masks) are
re-gathered into the padded order at call time with a single cheap gather.

Built once per graph on the host (numpy); shipped to the device as a pytree.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CsrLayout:
    """Edge layout for one reduction direction.

    Arrays (all [C, TE] except noted):
      gather1:   row index into the primary gathered operand (src for fwd);
                 BLOCK-LOCAL when block_rows > 0
      gather2:   row index into the secondary gathered operand (only used by
                 the d_relation kernel; zeros otherwise)
      aux:       per-edge relation id (VMEM relation lookup; zeros for drel)
      row_local: output row offset within the row tile
      edge_id:   index into the ORIGINAL edge array (weight re-gather)
      valid:     1.0 for real edges, 0.0 for alignment padding
      cr_pairs:  [2, C] (row_tile_of_chunk; row_tile_of_prev_chunk) — or
                 [3, C] for BLOCKED layouts, row 2 = source block of chunk

    block_rows > 0 marks a BLOCKED layout (build_blocked_layout): edges are
    additionally bucketed by source block of `block_rows` rows, so the kernel
    streams whole source blocks into VMEM (one BlockSpec fetch per bucket)
    and every per-edge gather is a VMEM read — no per-edge HBM DMAs."""

    gather1: jnp.ndarray
    gather2: jnp.ndarray
    aux: jnp.ndarray
    row_local: jnp.ndarray
    edge_id: jnp.ndarray
    valid: jnp.ndarray
    cr_pairs: jnp.ndarray
    tile_rows: int = dataclasses.field(metadata=dict(static=True))
    tile_edges: int = dataclasses.field(metadata=dict(static=True))
    num_row_tiles: int = dataclasses.field(metadata=dict(static=True))
    num_chunks: int = dataclasses.field(metadata=dict(static=True))
    block_rows: int = dataclasses.field(default=0, metadata=dict(static=True))
    num_blocks: int = dataclasses.field(default=0, metadata=dict(static=True))
    # run-interleaved blocked layout (interleave == K > 0): within each
    # bucket, same-output-row RUNS are length-split and snake-assigned to K
    # lanes; slot i belongs to lane i % K, so each of the kernel's K
    # accumulators owns whole runs and a row flush is ONE RMW (no K-way
    # accumulator sum, no per-edge row tags). `start` is 1 on the first slot
    # of each run segment within its chunk. Padding slots duplicate the
    # lane's last real edge (idempotent under extremum aggregation; add
    # kernels kill them via valid -> weight 0).
    start: object = None  # [C, TE] int32 or None
    interleave: int = dataclasses.field(default=0, metadata=dict(static=True))

    @property
    def padded_rows(self) -> int:
        return self.num_row_tiles * self.tile_rows

    @property
    def padded_gather_rows(self) -> int:
        return self.num_blocks * self.block_rows


def build_layout(
    row_ids: np.ndarray,
    gather1_ids: np.ndarray,
    aux_ids: np.ndarray,
    num_rows: int,
    gather2_ids: Optional[np.ndarray] = None,
    tile_rows: int = 256,
    tile_edges: int = 256,
) -> CsrLayout:
    """Sort edges by row_ids, align chunks to row tiles, pad chunk count to a
    multiple of 8. Uses the native C++ builder (native/graphlib.cpp) when
    available; numpy otherwise."""
    from ..native import csr_layout_build_native

    # the Pallas kernels iterate tile_edges in units of GROUP == NACC == 8
    # (te // 8 groups per chunk); a non-multiple would silently drop the
    # trailing te % 8 edges of every chunk
    assert tile_edges % 8 == 0, f"tile_edges must be a multiple of 8, got {tile_edges}"

    native = csr_layout_build_native(
        np.asarray(row_ids, np.int32), np.asarray(gather1_ids, np.int32),
        None if gather2_ids is None else np.asarray(gather2_ids, np.int32),
        np.asarray(aux_ids, np.int32), num_rows, tile_rows, tile_edges,
    )
    if native is not None:
        E2, g1, g2, aux, row_local, edge_id, valid, chunk_row = native
        return _finalize_layout(
            g1, g2, aux, row_local, edge_id, valid, chunk_row,
            num_rows, tile_rows, tile_edges,
        )
    E = len(row_ids)
    order = np.argsort(row_ids, kind="stable")
    rows = row_ids[order]
    rt = rows // tile_rows
    num_row_tiles = max(1, -(-num_rows // tile_rows))
    counts = np.bincount(rt, minlength=num_row_tiles)
    aligned = ((counts + tile_edges - 1) // tile_edges) * tile_edges
    # every row tile needs >= 1 chunk: the kernels only zero an output tile
    # when a chunk targeting it arrives, so edge-free tiles would otherwise
    # return uninitialized garbage
    aligned = np.maximum(aligned, tile_edges)
    starts = np.concatenate([[0], np.cumsum(aligned)])[:-1]
    orig_starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
    pos = starts[rt] + (np.arange(E) - orig_starts[rt])
    E2 = int(aligned.sum())

    def scatter(vals, fill=0, dtype=np.int32):
        out = np.full(E2, fill, dtype)
        out[pos] = vals
        return out

    g1 = scatter(gather1_ids[order])
    g2 = scatter(gather2_ids[order] if gather2_ids is not None else
                 np.zeros(E, np.int32))
    aux = scatter(aux_ids[order])
    row_local = scatter(rows - rt * tile_rows)
    edge_id = scatter(order.astype(np.int32))
    valid = scatter(np.ones(E, np.float32), 0.0, np.float32)

    C = E2 // tile_edges
    chunk_row = (
        np.searchsorted(starts, np.arange(C) * tile_edges, side="right") - 1
    ).astype(np.int32)
    return _finalize_layout(
        g1, g2, aux, row_local, edge_id, valid, chunk_row,
        num_rows, tile_rows, tile_edges,
    )


def _finalize_layout(
    g1, g2, aux, row_local, edge_id, valid, chunk_row,
    num_rows, tile_rows, tile_edges,
) -> CsrLayout:
    """Chunk the flat padded arrays and pad the chunk count to a multiple of
    8; padding chunks carry valid=0 and map to the last real chunk's tile."""
    num_row_tiles = max(1, -(-num_rows // tile_rows))
    C = len(chunk_row)
    Cp = ((C + 7) // 8) * 8

    def to_chunks(a, fill=0):
        out = np.full((Cp, tile_edges), fill, a.dtype)
        out[:C] = a.reshape(C, tile_edges)
        return out

    cr = np.full(Cp, chunk_row[-1] if C else 0, np.int32)
    cr[:C] = chunk_row
    # [2, Cp] layout: scalar-prefetch arrays live in SMEM where the minor
    # dimension is padded to 128 lanes — [Cp, 2] would blow the ~1MB SMEM cap
    # for million-edge graphs (Cp x 128 x 4 bytes)
    cr_pairs = np.stack([cr, np.concatenate([[-1], cr[:-1]])], 0).astype(np.int32)

    # NOTE: arrays stay host-side numpy here; build_rspmm_layouts ships the
    # finished pytree to the device in ONE pass at the end (device round-trips
    # during construction cost minutes on remote-TPU tunnels)
    return CsrLayout(
        gather1=to_chunks(g1),
        gather2=to_chunks(g2),
        aux=to_chunks(aux),
        row_local=to_chunks(row_local),
        edge_id=to_chunks(edge_id),
        valid=to_chunks(valid, 0.0),
        cr_pairs=cr_pairs,
        tile_rows=tile_rows,
        tile_edges=tile_edges,
        num_row_tiles=num_row_tiles,
        num_chunks=Cp,
    )


def _interleave_bucket(rl_sorted: np.ndarray, K: int, lane_q: int):
    """Lane assignment for one bucket of run-sorted edges.

    rl_sorted: row_local of the bucket's edges, sorted so same-row runs are
    contiguous. Runs longer than a cap are split (each segment flushes into
    the same output row — add and extremum aggregation both compose),
    segments are snake-assigned to K lanes by descending length (LPT-style
    balance), and each lane is padded to a common length that is a multiple
    of lane_q (so chunk boundaries preserve slot->lane alignment). The
    segment cap starts at ceil(Eb/K) and halves until the lane imbalance
    stops paying (finer splits cost one extra flush each but cut padding).

    Returns (dup, valid, start, nslots): dup[slot] = bucket-edge index whose
    fields the slot carries (padding duplicates the lane's last real edge),
    valid[slot] in {0, 1}, start[slot] = 1 on segment-first slots."""
    Eb = len(rl_sorted)
    if Eb == 0:
        n = lane_q * K
        return (np.zeros(n, np.int64), np.zeros(n, np.float32),
                np.zeros(n, np.int32), n)
    run_break = np.empty(Eb, bool)
    run_break[0] = True
    run_break[1:] = rl_sorted[1:] != rl_sorted[:-1]
    run_id = np.cumsum(run_break) - 1
    run_start_idx = np.flatnonzero(run_break)
    within_run = np.arange(Eb) - run_start_idx[run_id]
    ideal = -(-Eb // K)

    def assign(Lmax):
        seg_break = run_break | (within_run % Lmax == 0)
        seg_id = np.cumsum(seg_break) - 1
        seg_start = np.flatnonzero(seg_break)
        nseg = len(seg_start)
        seg_len = np.diff(np.append(seg_start, Eb))
        # snake-assign segments to lanes in descending length order
        order_seg = np.argsort(-seg_len, kind="stable")
        r = np.arange(nseg) % (2 * K)
        lane_of_rank = np.where(r < K, r, 2 * K - 1 - r)
        lane = np.empty(nseg, np.int64)
        lane[order_seg] = lane_of_rank
        # per-segment offset within its lane (assignment order): group by
        # lane, running sum of lengths
        rank_in = np.empty(nseg, np.int64)
        rank_in[order_seg] = np.arange(nseg)
        o2 = np.lexsort((rank_in, lane))
        len_sorted = seg_len[o2]
        csum = np.cumsum(len_sorted) - len_sorted
        lane_first = np.empty(nseg, bool)
        lane_first[0] = True
        lane_first[1:] = lane[o2][1:] != lane[o2][:-1]
        base = np.where(lane_first, csum, 0)
        np.maximum.accumulate(base, out=base)
        seg_off = np.empty(nseg, np.int64)
        seg_off[o2] = csum - base
        lane_tot = np.bincount(
            lane, weights=seg_len, minlength=K).astype(np.int64)
        within_seg = within_run % Lmax
        return seg_id, seg_off, lane, lane_tot, within_seg

    # a padding slot costs a full per-edge body pass (~17 cyc) while an
    # extra flush costs ~5 — split aggressively: tolerate only one VPU-group
    # (8 slots) of imbalance before halving the cap
    Lmax = max(1, ideal)
    seg_id, seg_off, lane, lane_tot, within_seg = assign(Lmax)
    while int(lane_tot.max()) > ideal + 8 and Lmax > 8:
        Lmax = max(8, Lmax // 2)
        seg_id, seg_off, lane, lane_tot, within_seg = assign(Lmax)
    lane_len = max(lane_q, -(-int(lane_tot.max()) // lane_q) * lane_q)
    nslots = lane_len * K
    pos = (seg_off[seg_id] + within_seg) * K + lane[seg_id]
    dup = np.zeros(nslots, np.int64)
    dup[pos] = np.arange(Eb)
    valid = np.zeros(nslots, np.float32)
    valid[pos] = 1.0
    start = np.zeros(nslots, np.int32)
    start[pos[within_seg == 0]] = 1
    # pad lane tails with the lane's last real edge (empty lanes: edge 0)
    last_slot = np.maximum(lane_tot - 1, 0) * K + np.arange(K)
    lane_last_edge = np.where(lane_tot > 0, dup[last_slot], 0)
    for j in range(K):
        if lane_tot[j] < lane_len:
            dup[np.arange(lane_tot[j], lane_len) * K + j] = lane_last_edge[j]
    return dup, valid, start, nslots


def build_blocked_layout(
    row_ids: np.ndarray,
    gather1_ids: np.ndarray,
    aux_ids: np.ndarray,
    num_rows: int,
    num_gather_rows: int,
    block_rows: int = 1024,
    tile_rows: int = 1024,
    tile_edges: int = 256,
    interleave: int = 0,
) -> CsrLayout:
    """Bucket edges by (output row tile, SOURCE block), sort by output row
    within each bucket, and chunk to tile_edges. The kernel then visits
    buckets dst-tile-major: the output tile stays VMEM-resident across its
    buckets, each bucket's source block arrives as ONE pipelined BlockSpec
    fetch, and per-edge gathers become VMEM reads. Streaming traffic is
    num_row_tiles * num_gather_rows * F bytes — choose this layout when that
    beats per-edge row DMAs (V^2/tile_rows < E, heavy-multigraph KGs).

    interleave=K > 0 additionally RUN-INTERLEAVES each bucket across K
    accumulator lanes (see CsrLayout.start): real KG buckets have mean run
    lengths of ~3-4, where the contiguous layout's K-way flush machinery
    costs ~10 cycles/edge — lane-owned runs flush with one RMW."""
    assert tile_edges % 8 == 0
    assert interleave == 0 or tile_edges % interleave == 0
    row_ids = np.asarray(row_ids, np.int64)
    gather1_ids = np.asarray(gather1_ids, np.int64)
    aux_ids = np.asarray(aux_ids, np.int32)
    E = len(row_ids)
    nt = max(1, -(-num_rows // tile_rows))
    nb = max(1, -(-num_gather_rows // block_rows))
    rt = row_ids // tile_rows
    sb = gather1_ids // block_rows
    order = np.lexsort((row_ids, sb, rt))
    bucket = (rt * nb + sb)[order]
    counts = np.bincount(bucket, minlength=nt * nb)
    if interleave:
        K = interleave
        lane_q = tile_edges // K
        rl_all = (row_ids - rt * tile_rows)[order]
        bstarts = np.concatenate([[0], np.cumsum(counts)])
        dups, valids, starts_f, aligned = [], [], [], np.zeros_like(counts)
        nonempty = np.flatnonzero(counts)
        # empty tiles still need one placeholder chunk in their (t, 0) bucket
        tile_has = counts.reshape(nt, nb).sum(axis=1) > 0
        placeholder = np.flatnonzero(~tile_has) * nb
        todo = np.union1d(nonempty, placeholder)
        pieces = {}
        for b in todo:
            lo, hi = bstarts[b], bstarts[b + 1]
            dup, val, st, n = _interleave_bucket(rl_all[lo:hi], K, lane_q)
            # placeholder (edge-free) buckets keep dup=0 absolute — their
            # fields are forced inert below
            pieces[b] = (dup + lo if hi > lo else dup, val, st)
            aligned[b] = n
        starts = np.concatenate([[0], np.cumsum(aligned)])[:-1]
        E2 = int(aligned.sum())
        take = np.zeros(E2, np.int64)  # slot -> index into sorted edges
        valid = np.zeros(E2, np.float32)
        start_arr = np.zeros(E2, np.int32)
        for b in todo:
            dup, val, st = pieces[b]
            s = starts[b]
            n = aligned[b]
            take[s : s + n] = dup
            valid[s : s + n] = val
            start_arr[s : s + n] = st
        # force a segment start on every lane's first slot of every chunk:
        # kernels then never carry lane state (acc/mark/current-src row)
        # across chunk boundaries — flushing a fresh accumulator is a no-op,
        # and partial-run flushes compose under both add and extremum
        if E2:
            cfirst = (np.arange(E2 // tile_edges)[:, None] * tile_edges
                      + np.arange(K)).ravel()
            start_arr[cfirst] = 1
        g1s = (gather1_ids - sb * block_rows)[order]
        auxs = aux_ids[order]
        rls = rl_all
        eids = order.astype(np.int32)
        has_any = E > 0
        g1 = g1s[take] if has_any else np.zeros(E2, np.int64)
        aux = auxs[take] if has_any else np.zeros(E2, np.int32)
        row_local = rls[take] if has_any else np.zeros(E2, np.int64)
        edge_id = eids[take] if has_any else np.zeros(E2, np.int32)
        # placeholder buckets (no edges anywhere in the take range) carry
        # zeros already via take=0 of an unrelated edge — force them inert
        if len(placeholder) and has_any:
            for b in placeholder:
                s, n = starts[b], aligned[b]
                g1[s : s + n] = 0
                aux[s : s + n] = 0
                row_local[s : s + n] = 0
                edge_id[s : s + n] = 0
        g1 = g1.astype(np.int32)
        aux = aux.astype(np.int32)
        row_local = row_local.astype(np.int32)
    else:
        aligned = ((counts + tile_edges - 1) // tile_edges) * tile_edges
        # every output tile needs >= 1 chunk (the kernel zeroes a tile only
        # when a chunk targeting it arrives): give empty tiles one padding
        # chunk in their (t, 0) bucket
        tile_chunks = aligned.reshape(nt, nb)
        empty_tiles = tile_chunks.sum(axis=1) == 0
        tile_chunks[empty_tiles, 0] = tile_edges
        aligned = tile_chunks.reshape(-1)
        starts = np.concatenate([[0], np.cumsum(aligned)])[:-1]
        orig_starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
        pos = starts[bucket] + (np.arange(E) - orig_starts[bucket])
        E2 = int(aligned.sum())
        start_arr = None

        def scatter(vals, fill=0, dtype=np.int32):
            out = np.full(E2, fill, dtype)
            out[pos] = vals.astype(dtype)
            return out

        g1 = scatter(gather1_ids[order] - sb[order] * block_rows)
        aux = scatter(aux_ids[order])
        row_local = scatter(row_ids[order] - rt[order] * tile_rows)
        edge_id = scatter(order.astype(np.int32))
        valid = scatter(np.ones(E, np.float32), 0.0, np.float32)

    C = E2 // tile_edges
    chunk_bucket = (
        np.searchsorted(starts, np.arange(C) * tile_edges, side="right") - 1
    )
    chunk_rt = (chunk_bucket // nb).astype(np.int32)
    chunk_sb = (chunk_bucket % nb).astype(np.int32)

    # manual bucket-lookahead prefetch schedule: the kernel double-buffers
    # streamed source blocks itself, issuing the NEXT bucket's block DMA at
    # the FIRST chunk of the current bucket — a whole bucket of compute
    # (~5 chunks) hides the fetch where BlockSpec pipelining's one-chunk
    # lookahead stalls at every bucket boundary.
    #   row 3: 1 on the first chunk of each bucket
    #   row 4: bucket ordinal parity (which of the two block buffers)
    #   row 5: source block of the NEXT bucket (self for the last bucket)
    #   row 6: 1 if a next bucket exists
    first = np.ones(C, np.int32)
    first[1:] = (chunk_bucket[1:] != chunk_bucket[:-1]).astype(np.int32)
    bidx = np.cumsum(first) - 1
    parity = (bidx % 2).astype(np.int32)
    fpos = np.flatnonzero(first)  # first chunk of each bucket
    bucket_blk = chunk_sb[fpos]  # block of bucket j
    nxt_blk_b = np.concatenate([bucket_blk[1:], bucket_blk[-1:]])
    has_nxt_b = np.zeros(len(fpos), np.int32)
    has_nxt_b[:-1] = 1
    nxt_blk = nxt_blk_b[bidx].astype(np.int32)
    has_nxt = has_nxt_b[bidx].astype(np.int32)

    Cp = ((C + 7) // 8) * 8

    def to_chunks(a, fill=0):
        out = np.full((Cp, tile_edges), fill, a.dtype)
        out[:C] = a.reshape(C, tile_edges)
        return out

    def pad_c(a, fill):
        out = np.full(Cp, fill, np.int32)
        out[:C] = a
        return out

    cr = pad_c(chunk_rt, chunk_rt[-1] if C else 0)
    csb = pad_c(chunk_sb, chunk_sb[-1] if C else 0)
    cr_pairs = np.stack(
        [
            cr,
            np.concatenate([[-1], cr[:-1]]),
            csb,
            pad_c(first, 0),  # padding chunks never start/wait DMAs
            pad_c(parity, parity[-1] if C else 0),
            pad_c(nxt_blk, 0),
            pad_c(has_nxt, 0),
        ],
        0,
    ).astype(np.int32)
    return CsrLayout(
        gather1=to_chunks(g1),
        gather2=to_chunks(np.zeros(E2, np.int32)),
        aux=to_chunks(aux),
        row_local=to_chunks(row_local),
        edge_id=to_chunks(edge_id),
        valid=to_chunks(valid, 0.0),
        cr_pairs=cr_pairs,
        tile_rows=tile_rows,
        tile_edges=tile_edges,
        num_row_tiles=nt,
        num_chunks=Cp,
        block_rows=block_rows,
        num_blocks=nb,
        start=None if start_arr is None else to_chunks(start_arr),
        interleave=interleave,
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RspmmLayouts:
    """The orderings one rspmm op needs. `rel` (relation-sorted, for the
    standalone d_relation SDDMM) is only required for the transe message
    function — distmult's d_relation rides the fused src-sorted backward —
    so it is None unless requested (device transfer of layouts is a real
    cost on remote-TPU setups).

    Optional hot-row split (real KGs have heavy-tailed degrees): `fwd` then
    covers only the COLD edges, `fwd_hot` the edges whose source is among the
    `hot_ids` highest-out-degree nodes — those rows are gathered from a
    VMEM-resident table instead of per-edge HBM DMAs."""

    fwd: CsrLayout  # rows = dst, gather1 = src (cold edges if hot split)
    rev: CsrLayout  # rows = src, gather1 = dst (d_input + fused d_relation)
    rel: object = None  # rows = etype, gather1 = src, gather2 = dst
    fwd_hot: object = None  # CsrLayout over hot-source edges (gather1 = hot rank)
    hot_ids: object = None  # int32 [K] node ids of the VMEM-resident rows
    rev_hot: object = None  # CsrLayout over hot-DST edges (backward g table)
    rev_hot_ids: object = None  # int32 [K] dst node ids for the backward
    # blocked-source layouts (build_blocked_layout): when present, the add-
    # aggregation forward/fused-backward stream source blocks through VMEM
    # instead of per-edge row DMAs. max/min backward keeps the DMA `rev`.
    fwd_blk: object = None
    rev_blk: object = None


def pad_layout_chunks(layout: CsrLayout, num_chunks: int) -> CsrLayout:
    """Pad a (host-side numpy) layout to `num_chunks` chunks with all-padding
    chunks (valid=0, cr pair equal so no tile re-zeroing, contributing
    nothing). Used to equalize static shapes across per-shard layouts so they
    stack along a leading shard axis."""
    C = layout.num_chunks
    if num_chunks == C:
        return layout
    assert num_chunks > C, (num_chunks, C)
    # blocked layouts carry a 7-row cr_pairs DMA schedule (first/parity/
    # next-block/has-next); replicating row 0's last tile id into those rows
    # would corrupt the manual stream schedule — only 2-row layouts pad here
    assert layout.block_rows == 0, (
        "pad_layout_chunks supports bucket (2-row cr_pairs) layouts only"
    )
    pad = num_chunks - C

    def padchunks(a, fill=0):
        a = np.asarray(a)
        return np.concatenate(
            [a, np.full((pad, a.shape[1]), fill, a.dtype)], axis=0
        )

    cr = np.asarray(layout.cr_pairs)
    last = int(cr[0, -1]) if cr.shape[1] else 0
    cr2 = np.concatenate(
        [cr, np.full((cr.shape[0], pad), last, np.int32)], axis=1
    ).astype(np.int32)
    return dataclasses.replace(
        layout,
        gather1=padchunks(layout.gather1),
        gather2=padchunks(layout.gather2),
        aux=padchunks(layout.aux),
        row_local=padchunks(layout.row_local),
        edge_id=padchunks(layout.edge_id),
        valid=padchunks(layout.valid, 0.0),
        cr_pairs=cr2,
        num_chunks=num_chunks,
    )


def _remap_edge_id(layout: CsrLayout, orig_ids: np.ndarray) -> CsrLayout:
    """Layouts built over an edge SUBSET carry subset-relative edge_id; remap
    to the original edge array so per-batch weight gathers stay global."""
    orig_ids = np.asarray(orig_ids, np.int32)
    if orig_ids.size == 0:
        # empty subset (e.g. every edge sourced from a hot row, so the cold
        # half is empty): the layout is all padding (valid=0 throughout) and
        # its zero-filled edge_id must not index into the empty id array
        return layout
    remapped = orig_ids[np.asarray(layout.edge_id)]
    return dataclasses.replace(layout, edge_id=remapped)


def blocked_wins(num_nodes: int, num_edges: int, tile_rows: int = 1024) -> bool:
    """Blocked-source streaming reads num_row_tiles * V rows total; per-edge
    DMAs read ~E rows. Prefer blocked when its traffic is smaller (with
    margin: per-edge DMAs also pay a serial descriptor floor the stream
    does not, so blocked is worth up to ~2x the raw byte parity)."""
    nt = max(1, -(-num_nodes // tile_rows))
    return nt * num_nodes <= 2 * num_edges


def build_rspmm_layouts(
    edge_index: np.ndarray,
    edge_type: np.ndarray,
    num_nodes: int,
    num_relations: int,
    tile_rows: int = 256,
    tile_edges: int = 256,
    include_rel_layout: bool = False,
    hot_rows: int = 0,
    blocked="auto",
    block_rows: int = 1024,
    bwd_block_rows: int = None,
    blocked_tile_edges: int = None,
    interleave="auto",
) -> RspmmLayouts:
    """hot_rows > 0 splits forward edges by source hotness: the hot_rows
    highest-out-degree sources' rows live in VMEM during the forward kernel
    (heavy-tailed KGs put most gathers there).

    blocked: True/False/'auto' — additionally build blocked-source layouts
    (source blocks streamed through VMEM; no per-edge DMAs) for the add-
    aggregation forward and fused backward. 'auto' enables them when the
    streaming traffic beats per-edge gathers (blocked_wins).

    bwd_block_rows: streamed-g block size of the backward (src-sorted)
    blocked layout. The fused backward keeps 2x more VMEM rows live per
    feature column than the forward (dx + x tiles + streamed g blocks + dr,
    all double-buffered), so the g blocks are half-size — the dx/x tiles
    stay at block_rows because streaming traffic scales with V^2/tile_rows,
    not with the g block size. Default: block_rows // 2, floored at 256."""
    edge_index = np.asarray(edge_index)
    edge_type = np.asarray(edge_type)
    src, dst = edge_index[:, 0], edge_index[:, 1]
    if blocked == "auto":
        blocked = blocked_wins(num_nodes, len(src), tile_rows=block_rows)
    if bwd_block_rows is None:
        bwd_block_rows = max(block_rows // 2, min(block_rows, 256))
    # blocked chunks default 2x the DMA layouts': no per-edge DMA pipeline to
    # keep fed, so larger chunks just amortize per-chunk costs (meta DMA wait,
    # loop prologue) — measured -2 ms on the fused backward at the bench shape
    bte = blocked_tile_edges or 2 * tile_edges
    if interleave == "auto":
        # run-interleaved blocked layouts (lane-owned run segments; see
        # _interleave_bucket). Requires the packed-metadata bounds — the
        # start flag rides the packed word's sign bit.
        import os

        want = int(os.environ.get("RSPMM_ILV", "0"))
        fits = (block_rows <= 1024 and (bwd_block_rows or 1) <= 1024
                and num_relations + 8 < 2048)
        interleave = 8 if (want and fits) else 0
    fwd_blk = rev_blk = None
    if blocked:
        fwd_blk = build_blocked_layout(
            dst, src, edge_type, num_nodes, num_nodes,
            block_rows=block_rows, tile_rows=block_rows, tile_edges=bte,
            interleave=interleave,
        )
        # bwd: FULL-size output (dx/x) tiles — streaming traffic scales with
        # V^2/tile_rows, so shrinking only the streamed-g block (not the dx
        # tile) keeps traffic at the forward's level while fitting the fused
        # backward's larger VMEM working set in one feature pass
        rev_blk = build_blocked_layout(
            src, dst, edge_type, num_nodes, num_nodes,
            block_rows=bwd_block_rows, tile_rows=block_rows,
            tile_edges=bte, interleave=interleave,
        )
    rel_layout = None
    if include_rel_layout:
        rel_layout = build_layout(
            edge_type, src, np.zeros_like(edge_type), num_relations,
            gather2_ids=dst,
            tile_rows=min(tile_rows, max(8, -(-num_relations // 8) * 8)),
            tile_edges=tile_edges,
        )
    fwd_hot = None
    hot_ids = None
    if hot_rows > 0 and num_nodes > hot_rows:
        out_deg = np.bincount(src, minlength=num_nodes)
        hot_ids = np.argsort(-out_deg, kind="stable")[:hot_rows].astype(np.int32)
        hot_rank = np.full(num_nodes, -1, np.int32)
        hot_rank[hot_ids] = np.arange(hot_rows, dtype=np.int32)
        is_hot = hot_rank[src] >= 0
        cold_idx = np.nonzero(~is_hot)[0].astype(np.int32)
        hot_idx = np.nonzero(is_hot)[0].astype(np.int32)
        fwd = _remap_edge_id(
            build_layout(dst[cold_idx], src[cold_idx], edge_type[cold_idx],
                         num_nodes, tile_rows=tile_rows, tile_edges=tile_edges),
            cold_idx,
        )
        fwd_hot = _remap_edge_id(
            build_layout(dst[hot_idx], hot_rank[src[hot_idx]],
                         edge_type[hot_idx], num_nodes,
                         tile_rows=tile_rows, tile_edges=tile_edges),
            hot_idx,
        )
    else:
        fwd = build_layout(dst, src, edge_type, num_nodes,
                           tile_rows=tile_rows, tile_edges=tile_edges)
    rev_hot = None
    rev_hot_ids = None
    if hot_rows > 0 and num_nodes > hot_rows:
        # backward gathers g[dst]: split by destination hotness
        in_deg = np.bincount(dst, minlength=num_nodes)
        rh_ids = np.argsort(-in_deg, kind="stable")[:hot_rows].astype(np.int32)
        rh_rank = np.full(num_nodes, -1, np.int32)
        rh_rank[rh_ids] = np.arange(hot_rows, dtype=np.int32)
        is_hot_d = rh_rank[dst] >= 0
        cold_d = np.nonzero(~is_hot_d)[0].astype(np.int32)
        hot_d = np.nonzero(is_hot_d)[0].astype(np.int32)
        rev = _remap_edge_id(
            build_layout(src[cold_d], dst[cold_d], edge_type[cold_d],
                         num_nodes, tile_rows=tile_rows, tile_edges=tile_edges),
            cold_d,
        )
        rev_hot = _remap_edge_id(
            build_layout(src[hot_d], rh_rank[dst[hot_d]], edge_type[hot_d],
                         num_nodes, tile_rows=tile_rows, tile_edges=tile_edges),
            hot_d,
        )
        rev_hot_ids = rh_ids
    else:
        rev = build_layout(src, dst, edge_type, num_nodes,
                           tile_rows=tile_rows, tile_edges=tile_edges)
    layouts = RspmmLayouts(
        fwd=fwd,
        rev=rev,
        rel=rel_layout,
        fwd_hot=fwd_hot,
        hot_ids=hot_ids,
        rev_hot=rev_hot,
        rev_hot_ids=rev_hot_ids,
        fwd_blk=fwd_blk,
        rev_blk=rev_blk,
    )
    # single host->device shipment of the whole pytree (leaves were kept
    # numpy throughout construction; no intermediate device round-trips)
    return jax.device_put(layouts)
