"""Pallas TPU kernels for the generalized relational SpMM (sum/max/min).

TPU-native replacement for the reference's CUDA rspmm kernel
(/root/reference README "compiled kernels", called at ultra/layer.py:134-178):
rather than relying on hardware caches for random row access (the GPU
strategy), the kernel streams CSR-ordered edge chunks, issues per-edge row
DMAs from HBM with a lookahead pipeline, multiplies by relation rows held in
VMEM, and accumulates into a VMEM-resident output row tile that is flushed
when the (monotonic) row tile advances. O(V·D) memory: messages never exist
in HBM.

Edge metadata ([C, 3, TE] int32 of gather-index/relation/row-offset plus
[C, 1, TE] f32 weights) stays in HBM and is DMA'd per chunk into SMEM scratch
with one-chunk lookahead — SMEM is ~1 MB on TPU, far too small to hold the
metadata of a million-edge graph outright.

Three reductions share the same template (see ops/csr.py for layouts):
  forward   out[dst]  += w * (rel[r] . x[src])
  d_input   dx[src]   += w * (rel[r] . g[dst])     (transposed layout)
  d_rel     dr[r]     += w * (x[src] . g[dst])     (relation-sorted layout)

Falls back to interpret mode off-TPU so unit tests validate the exact kernel
logic on CPU.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .csr import CsrLayout

_VMEM_DATA_BUDGET = 56 * 1024 * 1024  # gathered operand VMEM residency cap
# pipeline-depth knobs (env-overridable for the kernel-floor sweep,
# script/diagnostics/kernel_sweep.py; defaults = best measured config)
GROUP = int(os.environ.get("RSPMM_GROUP", 8))  # row DMAs per shared semaphore
NGRP = int(os.environ.get("RSPMM_NGRP", 4))    # groups in flight
_LANE = 128
# independent telescoping accumulators (FMA-chain ILP); divides tile_edges
NACC = int(os.environ.get("RSPMM_NACC", 8))
# identity element magnitude for max/min aggregation: rows that never receive
# a real edge keep +-_BIG and are masked to 0 after the kernel (the XLA
# oracle's empty-row convention). Real weight-0 edges still contribute 0,
# matching segment_max over weight-premultiplied messages.
_BIG = 3.0e38


def _agg_neutral(agg: str) -> float:
    return {"add": 0.0, "max": -_BIG, "min": _BIG}[agg]


def _agg_combine(agg: str):
    return {"add": jnp.add, "max": jnp.maximum, "min": jnp.minimum}[agg]


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _pad_lane(F: int) -> int:
    return -(-F // _LANE) * _LANE


def _meta_dmas(meta_hbm, w_hbm, mbuf, wbuf, msems, wsems, c, slot):
    return (
        pltpu.make_async_copy(meta_hbm.at[c], mbuf.at[slot], msems.at[slot]),
        pltpu.make_async_copy(w_hbm.at[c], wbuf.at[slot], wsems.at[slot]),
    )


# ---------------------------------------------------------------------------
# kernel template A: one gathered operand (+ optional VMEM relation lookup)
# ---------------------------------------------------------------------------


def _kernel_one_gather(
    cr_ref, meta_hbm, w_hbm, data_hbm, *rest, mode: str, num_chunks: int,
    agg: str = "add",
):
    if mode == "none":
        out_ref, mbuf, wbuf, msems, wsems, xbuf, sems, mark_ref = rest
        rel_ref = None
    else:
        rel_ref, out_ref, mbuf, wbuf, msems, wsems, xbuf, sems, mark_ref = rest
    c = pl.program_id(0)
    slot = jax.lax.rem(c, 2)
    nxt = jax.lax.rem(c + 1, 2)
    neutral = _agg_neutral(agg)
    combine = _agg_combine(agg)

    @pl.when(cr_ref[0, c] != cr_ref[1, c])
    def _():
        out_ref[...] = jnp.full_like(out_ref, neutral)

    # chunk 0: blocking fetch of its own metadata
    @pl.when(c == 0)
    def _():
        md, wd = _meta_dmas(meta_hbm, w_hbm, mbuf, wbuf, msems, wsems, 0, 0)
        md.start()
        wd.start()

    md, wd = _meta_dmas(meta_hbm, w_hbm, mbuf, wbuf, msems, wsems, c, slot)
    md.wait()
    wd.wait()

    # prefetch next chunk's metadata while we process this one
    @pl.when(c + 1 < num_chunks)
    def _():
        md2, wd2 = _meta_dmas(meta_hbm, w_hbm, mbuf, wbuf, msems, wsems, c + 1, nxt)
        md2.start()
        wd2.start()

    te = mbuf.shape[-1]
    ngroups = te // GROUP

    # grouped row DMAs: GROUP copies share one semaphore, waited once per
    # group (per-edge semaphore waits were a dominant serial cost)
    def start_group(g):
        gslot = jax.lax.rem(g, NGRP)
        for j in range(GROUP):
            pltpu.make_async_copy(
                data_hbm.at[mbuf[slot, 0, g * GROUP + j]],
                xbuf.at[gslot * GROUP + j],
                sems.at[gslot],
            ).start()

    def wait_group(g):
        gslot = jax.lax.rem(g, NGRP)
        # a descriptor spanning the group's buffer waits for exactly the
        # group's total bytes on the shared semaphore
        pltpu.make_async_copy(
            xbuf.at[pl.ds(gslot * GROUP, GROUP)],
            xbuf.at[pl.ds(gslot * GROUP, GROUP)],
            sems.at[gslot],
        ).wait()

    for g in range(NGRP):
        start_group(g)

    # run accumulation: edges are row-sorted, so consecutive edges usually
    # share the output row (mean in-degree). Accumulate the current run in
    # registers and touch the output row only on row change.
    #
    # agg='add' uses MULTI-ACCUMULATOR TELESCOPING: NACC independent
    # accumulators (edge i feeds acc[i % NACC], a static register) whose SUM
    # grows monotonically over the chunk; a row's contribution is the
    # difference sum(accs) - mark, where `mark` (VMEM scratch, touched only on
    # row change) snapshots the total at the previous flush. The per-edge
    # select/reset disappears AND the FMA dependency chain splits NACC ways
    # (the serial acc chain + flush-branch stall measured 10.5 cyc/edge,
    # multiacc recovers ~7.7 — script/diagnostics/kernel_floor.py); row-change
    # work lives in the flush branch, amortized over the mean in-degree run.
    # Padding edges carry w=0 and add nothing. Accumulation error stays
    # bounded by the per-chunk (<= tile_edges-edge) partial sums.
    if agg == "add":
        mark_ref[...] = jnp.zeros_like(mark_ref)

        def body(g, carry):
            d_prev, *accs = carry
            accs = list(accs)
            gslot = jax.lax.rem(g, NGRP)
            wait_group(g)

            @pl.when(g + NGRP < ngroups)
            def _():
                start_group(g + NGRP)

            for j in range(GROUP):
                i = g * GROUP + j
                xrow = xbuf[gslot * GROUP + j]
                w = wbuf[slot, 0, i]
                d = mbuf[slot, 2, i]
                flush = d != d_prev

                @pl.when(flush)
                def _(d_prev=d_prev, accs=tuple(accs)):
                    total = accs[0]
                    for k in range(1, NACC):
                        total = total + accs[k]
                    out_ref[pl.ds(d_prev, 1)] = (
                        out_ref[pl.ds(d_prev, 1)]
                        + (total - mark_ref[...])[None]
                    )
                    mark_ref[...] = total

                if mode == "mul_rel":
                    msg = rel_ref[mbuf[slot, 1, i]] * xrow
                elif mode == "add_rel":
                    msg = rel_ref[mbuf[slot, 1, i]] + xrow
                else:  # none
                    msg = xrow
                accs[j % NACC] = accs[j % NACC] + msg.astype(jnp.float32) * w
                d_prev = d
            return (d_prev, *accs)

        zrow = jnp.zeros(out_ref.shape[1:], jnp.float32)
        d_last, *accs = jax.lax.fori_loop(
            0, ngroups, body, (0,) + (zrow,) * NACC
        )
        total = accs[0]
        for k in range(1, NACC):
            total = total + accs[k]
        out_ref[pl.ds(d_last, 1)] = (
            out_ref[pl.ds(d_last, 1)] + (total - mark_ref[...])[None]
        )
        return

    # agg max/min: NACC-way rotation with PER-ACC ROW TAGS (lazy reset).
    # Extremum cannot telescope (no inverse), so each accumulator instead
    # remembers which output row it belongs to: a flush combines only the
    # accumulators tagged with the flushed row, and a stale accumulator is
    # OVERWRITTEN (not combined) the first time its slot is reused for a new
    # row. The per-edge path is then a branch-light select+combine split
    # NACC ways — the same ILP recovery the sum path gets from telescoping
    # (the single-chain select/combine body ran at ~2x the sum path's time).
    # Combine order never changes max/min results bitwise, so the backward's
    # argext recompute-equality is preserved.
    def body(g, carry):
        d_prev, *state = carry
        accs = list(state[:NACC])
        tags = list(state[NACC:])
        gslot = jax.lax.rem(g, NGRP)
        wait_group(g)

        @pl.when(g + NGRP < ngroups)
        def _():
            start_group(g + NGRP)

        for j in range(GROUP):
            i = g * GROUP + j
            xrow = xbuf[gslot * GROUP + j]
            w = wbuf[slot, 0, i]
            if mode == "mul_rel":
                msg = rel_ref[mbuf[slot, 1, i]] * xrow
            elif mode == "add_rel":
                msg = rel_ref[mbuf[slot, 1, i]] + xrow
            else:  # none
                msg = xrow
            msg = msg.astype(jnp.float32) * w
            # padding edges must be the aggregation identity, not 0
            msg = jnp.where(mbuf[slot, 3, i] != 0, msg, neutral)
            d = mbuf[slot, 2, i]
            flush = d != d_prev

            @pl.when(flush)
            def _(d_prev=d_prev, accs=tuple(accs), tags=tuple(tags)):
                total = jnp.full(out_ref.shape[1:], neutral, jnp.float32)
                for k in range(NACC):
                    total = combine(
                        total, jnp.where(tags[k] == d_prev, accs[k], neutral)
                    )
                out_ref[pl.ds(d_prev, 1)] = combine(
                    out_ref[pl.ds(d_prev, 1)], total[None]
                )

            k = j % NACC
            accs[k] = jnp.where(d == tags[k], combine(accs[k], msg), msg)
            tags[k] = d
            d_prev = d
        return (d_prev, *accs, *tags)

    # row_local of padding chunks is 0, so a dummy previous row of 0 with
    # all-stale (-1) tags is always safe
    zrow = jnp.full(out_ref.shape[1:], neutral, jnp.float32)
    d_last, *state = jax.lax.fori_loop(
        0, ngroups, body,
        (0,) + (zrow,) * NACC + (jnp.int32(-1),) * NACC,
    )
    accs, tags = state[:NACC], state[NACC:]
    total = jnp.full(out_ref.shape[1:], neutral, jnp.float32)
    for k in range(NACC):
        total = combine(total, jnp.where(tags[k] == d_last, accs[k], neutral))
    out_ref[pl.ds(d_last, 1)] = combine(out_ref[pl.ds(d_last, 1)], total[None])


# ---------------------------------------------------------------------------
# VMEM-resident variants: when the gathered operand's rows fit in VMEM
# (relation graphs: 2R nodes, a few MB), per-edge HBM DMAs disappear
# entirely — gathers become dynamic VMEM row reads.
# ---------------------------------------------------------------------------


def _kernel_one_gather_vmem(
    cr_ref, meta_hbm, w_hbm, data_ref, *rest, mode: str, num_chunks: int,
    agg: str = "add", packed: bool = False, manual_stream: bool = False,
):
    if manual_stream:
        *rest, xblk, xsems = rest
    if mode == "none":
        out_ref, mbuf, wbuf, msems, wsems, mark_ref = rest
        rel_ref = None
    else:
        rel_ref, out_ref, mbuf, wbuf, msems, wsems, mark_ref = rest
    c = pl.program_id(0)
    slot = jax.lax.rem(c, 2)
    nxt = jax.lax.rem(c + 1, 2)
    neutral = _agg_neutral(agg)
    combine = _agg_combine(agg)

    @pl.when(cr_ref[0, c] != cr_ref[1, c])
    def _():
        out_ref[...] = jnp.full_like(out_ref, neutral)

    @pl.when(c == 0)
    def _():
        md, wd = _meta_dmas(meta_hbm, w_hbm, mbuf, wbuf, msems, wsems, 0, 0)
        md.start()
        wd.start()

    md, wd = _meta_dmas(meta_hbm, w_hbm, mbuf, wbuf, msems, wsems, c, slot)
    md.wait()
    wd.wait()

    @pl.when(c + 1 < num_chunks)
    def _():
        md2, wd2 = _meta_dmas(meta_hbm, w_hbm, mbuf, wbuf, msems, wsems, c + 1, nxt)
        md2.start()
        wd2.start()

    if manual_stream:
        bslot = _stream_preamble(cr_ref, data_ref, xblk, xsems, c)

        def read(idx):
            return xblk[bslot, idx]
    else:
        def read(idx):
            return data_ref[idx]

    te = mbuf.shape[-1]

    if agg == "add":
        # multi-accumulator telescoping (see _kernel_one_gather): per-edge
        # work is read + FMA into a static rotation of NACC independent
        # accumulators; row flushes write total-minus-mark differences
        mark_ref[...] = jnp.zeros_like(mark_ref)

        def body(q, carry):
            d_prev, *accs = carry
            accs = list(accs)
            for j in range(NACC):
                i = q * NACC + j
                gi, ai, d = _decode_meta(mbuf, slot, i, packed)
                xrow = read(gi)
                w = wbuf[slot, 0, i]
                flush = d != d_prev

                @pl.when(flush)
                def _(d_prev=d_prev, accs=tuple(accs)):
                    total = accs[0]
                    for k in range(1, NACC):
                        total = total + accs[k]
                    out_ref[pl.ds(d_prev, 1)] = (
                        out_ref[pl.ds(d_prev, 1)]
                        + (total - mark_ref[...])[None]
                    )
                    mark_ref[...] = total

                if mode == "mul_rel":
                    msg = rel_ref[ai] * xrow
                elif mode == "add_rel":
                    msg = rel_ref[ai] + xrow
                elif mode == "rot_rel":
                    # planar complex multiply: rows carry [re | im] halves
                    # (see _planarize); fh = half the feature tiles
                    msg = _cplx_mul(rel_ref[ai], xrow)
                else:
                    msg = xrow
                accs[j] = accs[j] + msg.astype(jnp.float32) * w
                d_prev = d
            return (d_prev, *accs)

        zrow = jnp.zeros(out_ref.shape[1:], jnp.float32)
        d_last, *accs = jax.lax.fori_loop(
            0, te // NACC, body, (0,) + (zrow,) * NACC
        )
        total = accs[0]
        for k in range(1, NACC):
            total = total + accs[k]
        out_ref[pl.ds(d_last, 1)] = (
            out_ref[pl.ds(d_last, 1)] + (total - mark_ref[...])[None]
        )
        return

    # agg max/min: NACC-way rotation with per-acc row tags (lazy reset) —
    # see the DMA variant (_kernel_one_gather) for the full rationale
    def body(q, carry):
        d_prev, *state = carry
        accs = list(state[:NACC])
        tags = list(state[NACC:])
        for j in range(NACC):
            i = q * NACC + j
            gi, ai, d = _decode_meta(mbuf, slot, i, packed)
            xrow = read(gi)
            w = wbuf[slot, 0, i]
            if mode == "mul_rel":
                msg = rel_ref[ai] * xrow
            elif mode == "add_rel":
                msg = rel_ref[ai] + xrow
            elif mode == "rot_rel":
                msg = _cplx_mul(rel_ref[ai], xrow)
            else:
                msg = xrow
            msg = msg.astype(jnp.float32) * w
            msg = jnp.where(mbuf[slot, 3, i] != 0, msg, neutral)
            flush = d != d_prev

            @pl.when(flush)
            def _(d_prev=d_prev, accs=tuple(accs), tags=tuple(tags)):
                total = jnp.full(out_ref.shape[1:], neutral, jnp.float32)
                for k in range(NACC):
                    total = combine(
                        total, jnp.where(tags[k] == d_prev, accs[k], neutral)
                    )
                out_ref[pl.ds(d_prev, 1)] = combine(
                    out_ref[pl.ds(d_prev, 1)], total[None]
                )

            accs[j] = jnp.where(d == tags[j], combine(accs[j], msg), msg)
            tags[j] = d
            d_prev = d
        return (d_prev, *accs, *tags)

    zrow = jnp.full(out_ref.shape[1:], neutral, jnp.float32)
    d_last, *state = jax.lax.fori_loop(
        0, te // NACC, body,
        (0,) + (zrow,) * NACC + (jnp.int32(-1),) * NACC,
    )
    accs, tags = state[:NACC], state[NACC:]
    total = jnp.full(out_ref.shape[1:], neutral, jnp.float32)
    for k in range(NACC):
        total = combine(total, jnp.where(tags[k] == d_last, accs[k], neutral))
    out_ref[pl.ds(d_last, 1)] = combine(out_ref[pl.ds(d_last, 1)], total[None])


def _decode_meta_ilv(mbuf, slot, i):
    """Interleaved packed word: start << 31 | gather << 21 | aux << 10 |
    row_local (see _pack_meta_ilv). start rides the sign bit — the three
    field decodes mask it off, so it costs nothing extra."""
    m = mbuf[slot, 0, i]
    return (m >> 21) & 1023, (m >> 10) & 2047, m & 1023, m < 0


def _kernel_one_gather_ilv(
    cr_ref, meta_hbm, w_hbm, data_ref, *rest, mode: str, num_chunks: int,
    agg: str = "add",
):
    """Run-interleaved blocked forward (csr.build_blocked_layout
    interleave=NACC): lane j = slot j % NACC owns whole run segments, so a
    row flush is ONE telescoped RMW (add: per-lane mark scratch row) or ONE
    combine RMW (extremum) — no NACC-way accumulator sum, no per-edge row
    tags. Contiguous-body flush machinery costs ~10 cyc/edge at the real
    mean run length of ~3-4; this body pays ~flush/runlen."""
    *rest, xblk, xsems = rest
    if mode == "none":
        out_ref, mbuf, wbuf, msems, wsems, mark_ref = rest
        rel_ref = None
    else:
        rel_ref, out_ref, mbuf, wbuf, msems, wsems, mark_ref = rest
    c = pl.program_id(0)
    slot = jax.lax.rem(c, 2)
    nxt = jax.lax.rem(c + 1, 2)
    neutral = _agg_neutral(agg)
    combine = _agg_combine(agg)

    @pl.when(cr_ref[0, c] != cr_ref[1, c])
    def _():
        out_ref[...] = jnp.full_like(out_ref, neutral)

    @pl.when(c == 0)
    def _():
        md, wd = _meta_dmas(meta_hbm, w_hbm, mbuf, wbuf, msems, wsems, 0, 0)
        md.start()
        wd.start()

    md, wd = _meta_dmas(meta_hbm, w_hbm, mbuf, wbuf, msems, wsems, c, slot)
    md.wait()
    wd.wait()

    @pl.when(c + 1 < num_chunks)
    def _():
        md2, wd2 = _meta_dmas(meta_hbm, w_hbm, mbuf, wbuf, msems, wsems, c + 1, nxt)
        md2.start()
        wd2.start()

    bslot = _stream_preamble(cr_ref, data_ref, xblk, xsems, c)
    te = mbuf.shape[-1]

    def message(gi, ai):
        xrow = xblk[bslot, gi]
        if mode == "mul_rel":
            return rel_ref[ai] * xrow
        if mode == "add_rel":
            return rel_ref[ai] + xrow
        if mode == "rot_rel":
            return _cplx_mul(rel_ref[ai], xrow)
        return xrow

    zrow = jnp.zeros(out_ref.shape[1:], jnp.float32)

    if agg == "add":
        # per-lane telescoping: mark_ref[j] snapshots acc[j] at its last
        # flush; padding slots carry w=0 and change nothing
        mark_ref[...] = jnp.zeros_like(mark_ref)

        def body(q, carry):
            pds = list(carry[:NACC])
            accs = list(carry[NACC:])
            for j in range(NACC):
                i = q * NACC + j
                gi, ai, d, start = _decode_meta_ilv(mbuf, slot, i)
                w = wbuf[slot, 0, i]

                @pl.when(start)
                def _(pd=pds[j], acc=accs[j], j=j):
                    out_ref[pl.ds(pd, 1)] = (
                        out_ref[pl.ds(pd, 1)]
                        + (acc - mark_ref[pl.ds(j, 1)][0])[None]
                    )
                    mark_ref[pl.ds(j, 1)] = acc[None]

                accs[j] = accs[j] + message(gi, ai).astype(jnp.float32) * w
                pds[j] = d
            return (*pds, *accs)

        state = jax.lax.fori_loop(
            0, te // NACC, body, (jnp.int32(0),) * NACC + (zrow,) * NACC
        )
        pds, accs = state[:NACC], state[NACC:]
        for j in range(NACC):
            out_ref[pl.ds(pds[j], 1)] = (
                out_ref[pl.ds(pds[j], 1)]
                + (accs[j] - mark_ref[pl.ds(j, 1)][0])[None]
            )
        return

    # extremum: acc resets to the incoming message on segment starts;
    # alignment-padding slots (valid=0) become neutral — weight-0 REAL edges
    # still participate as 0 (the reference kernel's semantics)
    nrow = jnp.full(out_ref.shape[1:], neutral, jnp.float32)

    def body(q, carry):
        pds = list(carry[:NACC])
        accs = list(carry[NACC:])
        for j in range(NACC):
            i = q * NACC + j
            gi, ai, d, start = _decode_meta_ilv(mbuf, slot, i)
            w = wbuf[slot, 0, i]
            msg = message(gi, ai).astype(jnp.float32) * w
            msg = jnp.where(mbuf[slot, 3, i] != 0, msg, neutral)

            @pl.when(start)
            def _(pd=pds[j], acc=accs[j]):
                out_ref[pl.ds(pd, 1)] = combine(
                    out_ref[pl.ds(pd, 1)], acc[None]
                )

            accs[j] = jnp.where(start, msg, combine(accs[j], msg))
            pds[j] = d
        return (*pds, *accs)

    state = jax.lax.fori_loop(
        0, te // NACC, body, (jnp.int32(0),) * NACC + (nrow,) * NACC
    )
    pds, accs = state[:NACC], state[NACC:]
    for j in range(NACC):
        out_ref[pl.ds(pds[j], 1)] = combine(
            out_ref[pl.ds(pds[j], 1)], accs[j][None]
        )


def _kernel_bwd_fused_ilv(
    cr_ref, meta_hbm, w_hbm, g_ref, rel_ref, x_ref, dx_ref, dr_ref,
    mbuf, wbuf, msems, wsems, mark_ref, xrow_ref, gblk, gsems, *,
    mode: str, num_chunks: int,
    argext: bool = False, argext_pair: bool = False, moments: bool = False,
):
    """Run-interleaved fused backward (distmult/rotate; argext/moments pair
    variants stream packed multi-plane dst blocks — see
    _kernel_bwd_fused_vmem for the per-edge math): lane-owned src segments —
    dx flushes are one telescoped RMW per segment and the current-src x row
    is refreshed per lane on segment starts (xrow_ref[j]). dr keeps the
    per-edge RMW of the contiguous body. Padding slots carry w=0, so every
    gradient term dies through w."""
    c = pl.program_id(0)
    slot = jax.lax.rem(c, 2)
    nxt = jax.lax.rem(c + 1, 2)

    @pl.when(cr_ref[0, c] != cr_ref[1, c])
    def _():
        dx_ref[...] = jnp.zeros_like(dx_ref)

    @pl.when(c == 0)
    def _():
        dr_ref[...] = jnp.zeros_like(dr_ref)
        md, wd = _meta_dmas(meta_hbm, w_hbm, mbuf, wbuf, msems, wsems, 0, 0)
        md.start()
        wd.start()

    md, wd = _meta_dmas(meta_hbm, w_hbm, mbuf, wbuf, msems, wsems, c, slot)
    md.wait()
    wd.wait()

    @pl.when(c + 1 < num_chunks)
    def _():
        md2, wd2 = _meta_dmas(meta_hbm, w_hbm, mbuf, wbuf, msems, wsems, c + 1, nxt)
        md2.start()
        wd2.start()

    bslot = _stream_preamble(cr_ref, g_ref, gblk, gsems, c)
    te = mbuf.shape[-1]
    mark_ref[...] = jnp.zeros_like(mark_ref)
    zrow = jnp.zeros(dx_ref.shape[1:], jnp.float32)

    def body(q, carry):
        pds = list(carry[:NACC])
        accs = list(carry[NACC:])
        for j in range(NACC):
            i = q * NACC + j
            gi, r, d, start = _decode_meta_ilv(mbuf, slot, i)
            w = wbuf[slot, 0, i]

            @pl.when(start)
            def _(pd=pds[j], acc=accs[j], j=j, d=d):
                dx_ref[pl.ds(pd, 1)] = (
                    dx_ref[pl.ds(pd, 1)]
                    + (acc - mark_ref[pl.ds(j, 1)][0])[None]
                )
                mark_ref[pl.ds(j, 1)] = acc[None]
                xrow_ref[pl.ds(j, 1)] = x_ref[pl.ds(d, 1)]

            grow = gblk[bslot, gi]
            xrow = xrow_ref[pl.ds(j, 1)][0].astype(jnp.float32)
            if moments:
                m = (rel_ref[r].astype(jnp.float32) * xrow)
                inner = grow[0] * w + (2.0 * m) * (grow[1] * w)
                dx_msg = rel_ref[r].astype(jnp.float32) * inner
                dr_msg = xrow * inner
            elif argext or argext_pair:
                if mode == "mul":
                    msg = (rel_ref[r].astype(jnp.float32) * xrow) * w
                else:
                    msg = (rel_ref[r].astype(jnp.float32) + xrow) * w
                gws = jnp.where(msg == grow[1], grow[0] * w, 0.0)
                if argext_pair:
                    gws = gws + jnp.where(msg == grow[3], grow[2] * w, 0.0)
                if mode == "mul":
                    dx_msg = rel_ref[r].astype(jnp.float32) * gws
                    dr_msg = xrow * gws
                else:
                    dx_msg = gws
                    dr_msg = gws
            else:
                gw = grow.astype(jnp.float32) * w
                if mode == "rotate":
                    dx_msg = _cplx_conj_mul(
                        rel_ref[r].astype(jnp.float32), gw)
                    dr_msg = _cplx_conj_mul(xrow, gw)
                else:
                    dx_msg = rel_ref[r].astype(jnp.float32) * gw
                    dr_msg = xrow * gw
            accs[j] = accs[j] + dx_msg
            dr_ref[pl.ds(r, 1)] = dr_ref[pl.ds(r, 1)] + dr_msg[None]
            pds[j] = d
        return (*pds, *accs)

    state = jax.lax.fori_loop(
        0, te // NACC, body, (jnp.int32(0),) * NACC + (zrow,) * NACC
    )
    pds, accs = state[:NACC], state[NACC:]
    for j in range(NACC):
        dx_ref[pl.ds(pds[j], 1)] = (
            dx_ref[pl.ds(pds[j], 1)]
            + (accs[j] - mark_ref[pl.ds(j, 1)][0])[None]
        )


def _kernel_bwd_fused_vmem(
    cr_ref, meta_hbm, w_hbm, g_ref, rel_ref, x_ref, dx_ref, dr_ref,
    mbuf, wbuf, msems, wsems, mark_ref, xrow_ref, *rest, mode: str,
    num_chunks: int, packed: bool = False, manual_stream: bool = False,
    argext: bool = False, argext_pair: bool = False, moments: bool = False,
):
    if moments:
        # fused sum+sum-of-squares backward (distmult): the streamed dst
        # blocks carry (g_s, g_sq) pairs; both gradients factor through one
        # shared inner term — dx = rel*(w*g_s + 2*msg*w*g_sq), dr = x*(same)
        # with msg = rel*x recomputed from the resident x row.
        assert mode == "mul" and manual_stream
    elif argext or argext_pair:
        # blocked argext backward for max/min: the streamed dst blocks carry
        # PACKED (g, saved-extremum) row pairs — read(gi) returns [2, ft,
        # lane] (or [4, ...] for the fused max+min pair: g_max, out_max,
        # g_min, out_min). An edge flows gradient only on lanes where its
        # recomputed message equals the extremum (template D's convention);
        # padding and weight-0 edges die through the w factor, so no
        # valid-flag read. The pair variant shares the message recompute and
        # the dx/dr flows between both extrema — their equality-gated
        # gradients just sum before the rel/x multiplies.
        assert mode in ("mul", "add") and manual_stream
    else:
        assert mode in ("mul", "rotate"), (
            "fused backward covers distmult/rotate (transe rides gather1)"
        )
    if manual_stream:
        gblk, gsems = rest
    c = pl.program_id(0)
    slot = jax.lax.rem(c, 2)
    nxt = jax.lax.rem(c + 1, 2)

    @pl.when(cr_ref[0, c] != cr_ref[1, c])
    def _():
        dx_ref[...] = jnp.zeros_like(dx_ref)

    @pl.when(c == 0)
    def _():
        dr_ref[...] = jnp.zeros_like(dr_ref)
        md, wd = _meta_dmas(meta_hbm, w_hbm, mbuf, wbuf, msems, wsems, 0, 0)
        md.start()
        wd.start()

    md, wd = _meta_dmas(meta_hbm, w_hbm, mbuf, wbuf, msems, wsems, c, slot)
    md.wait()
    wd.wait()

    @pl.when(c + 1 < num_chunks)
    def _():
        md2, wd2 = _meta_dmas(meta_hbm, w_hbm, mbuf, wbuf, msems, wsems, c + 1, nxt)
        md2.start()
        wd2.start()

    if manual_stream:
        bslot = _stream_preamble(cr_ref, g_ref, gblk, gsems, c)

        def read(idx):
            return gblk[bslot, idx]
    else:
        def read(idx):
            return g_ref[idx]

    te = mbuf.shape[-1]

    # multi-accumulator telescoping dx (see _kernel_one_gather): all
    # row-change work — dx flush, mark snapshot, current-src x row refresh —
    # lives in the flush branch; the per-edge path is load-FMA into a static
    # rotation of NACC independent accumulators
    mark_ref[...] = jnp.zeros_like(mark_ref)

    def body(q, carry):
        d_prev, *accs = carry
        accs = list(accs)
        for j in range(NACC):
            i = q * NACC + j
            gi, r, d = _decode_meta(mbuf, slot, i, packed)
            grow = read(gi)
            w = wbuf[slot, 0, i]
            flush = d != d_prev

            @pl.when(flush)
            def _(d_prev=d_prev, accs=tuple(accs), d=d):
                total = accs[0]
                for k in range(1, NACC):
                    total = total + accs[k]
                dx_ref[pl.ds(d_prev, 1)] = (
                    dx_ref[pl.ds(d_prev, 1)] + (total - mark_ref[...])[None]
                )
                mark_ref[...] = total
                xrow_ref[...] = x_ref[d]

            if moments:
                m = (rel_ref[r] * xrow_ref[...]).astype(jnp.float32)
                inner = grow[0] * w + (2.0 * m) * (grow[1] * w)
                dx_msg = rel_ref[r].astype(jnp.float32) * inner
                dr_msg = xrow_ref[...].astype(jnp.float32) * inner
            elif argext or argext_pair:
                # recompute the forward message EXACTLY (bitwise) and gate
                # the gradient on equality with the saved extremum
                if mode == "mul":
                    msg = (rel_ref[r] * xrow_ref[...]).astype(jnp.float32) * w
                else:
                    msg = (rel_ref[r] + xrow_ref[...]).astype(jnp.float32) * w
                gws = jnp.where(msg == grow[1], grow[0] * w, 0.0)
                if argext_pair:
                    gws = gws + jnp.where(msg == grow[3], grow[2] * w, 0.0)
                if mode == "mul":
                    dx_msg = rel_ref[r].astype(jnp.float32) * gws
                    dr_msg = xrow_ref[...].astype(jnp.float32) * gws
                else:
                    dx_msg = gws
                    dr_msg = gws
            else:
                # transe's d_input/d_relation ride the gather1 path instead
                gw = grow.astype(jnp.float32) * w
                if mode == "rotate":
                    # dx = conj(rel) (x) g ; dr = conj(x) (x) g
                    dx_msg = _cplx_conj_mul(rel_ref[r].astype(jnp.float32), gw)
                    dr_msg = _cplx_conj_mul(xrow_ref[...].astype(jnp.float32), gw)
                else:
                    dx_msg = rel_ref[r].astype(jnp.float32) * gw
                    dr_msg = xrow_ref[...].astype(jnp.float32) * gw
            accs[j] = accs[j] + dx_msg
            dr_ref[pl.ds(r, 1)] = dr_ref[pl.ds(r, 1)] + dr_msg[None]
            d_prev = d
        return (d_prev, *accs)

    zrow = jnp.zeros(dx_ref.shape[1:], jnp.float32)
    d_last, *accs = jax.lax.fori_loop(
        0, te // NACC, body, (-1,) + (zrow,) * NACC
    )
    total = accs[0]
    for k in range(1, NACC):
        total = total + accs[k]
    dx_ref[pl.ds(d_last, 1)] = (
        dx_ref[pl.ds(d_last, 1)] + (total - mark_ref[...])[None]
    )


def _kernel_gather_maxmin_vmem(
    cr_ref, meta_hbm, w_hbm, data_ref, rel_ref, omx_ref, omn_ref,
    mbuf, wbuf, msems, wsems, xblk, xsems,
    *, mode: str, num_chunks: int, packed: bool = False,
):
    """Fused max+min forward over the blocked-source layout: ONE stream of x
    blocks and one message compute feed BOTH extrema (pna's aggregate issues
    max and min on the same (relation, x) — the reference runs two full
    kernel passes there, /root/reference/ultra/layer.py:154-178). Row tags
    are shared between the two accumulator sets (both flush at the same row
    changes); per-edge extra cost over a single extremum is one select and
    one combine, vs a full second stream + message recompute for two passes.
    Results are bitwise identical to separate max and min kernels (combine
    order never changes extrema), so the argext backward's
    recompute-equality applies unchanged to each output."""
    c = pl.program_id(0)
    slot = jax.lax.rem(c, 2)
    nxt = jax.lax.rem(c + 1, 2)

    @pl.when(cr_ref[0, c] != cr_ref[1, c])
    def _():
        omx_ref[...] = jnp.full_like(omx_ref, -_BIG)
        omn_ref[...] = jnp.full_like(omn_ref, _BIG)

    @pl.when(c == 0)
    def _():
        md, wd = _meta_dmas(meta_hbm, w_hbm, mbuf, wbuf, msems, wsems, 0, 0)
        md.start()
        wd.start()

    md, wd = _meta_dmas(meta_hbm, w_hbm, mbuf, wbuf, msems, wsems, c, slot)
    md.wait()
    wd.wait()

    @pl.when(c + 1 < num_chunks)
    def _():
        md2, wd2 = _meta_dmas(meta_hbm, w_hbm, mbuf, wbuf, msems, wsems, c + 1, nxt)
        md2.start()
        wd2.start()

    bslot = _stream_preamble(cr_ref, data_ref, xblk, xsems, c)
    te = mbuf.shape[-1]

    def body(q, carry):
        d_prev, *state = carry
        amx = list(state[:NACC])
        amn = list(state[NACC : 2 * NACC])
        tags = list(state[2 * NACC :])
        for j in range(NACC):
            i = q * NACC + j
            gi, ai, d = _decode_meta(mbuf, slot, i, packed)
            xrow = xblk[bslot, gi]
            w = wbuf[slot, 0, i]
            if mode == "mul_rel":
                msg = rel_ref[ai] * xrow
            else:
                msg = rel_ref[ai] + xrow
            msg = msg.astype(jnp.float32) * w
            valid = mbuf[slot, 3, i] != 0
            mmx = jnp.where(valid, msg, -_BIG)
            mmn = jnp.where(valid, msg, _BIG)
            flush = d != d_prev

            @pl.when(flush)
            def _(d_prev=d_prev, amx=tuple(amx), amn=tuple(amn),
                  tags=tuple(tags)):
                tmx = jnp.full(omx_ref.shape[1:], -_BIG, jnp.float32)
                tmn = jnp.full(omn_ref.shape[1:], _BIG, jnp.float32)
                for k in range(NACC):
                    sel = tags[k] == d_prev
                    tmx = jnp.maximum(tmx, jnp.where(sel, amx[k], -_BIG))
                    tmn = jnp.minimum(tmn, jnp.where(sel, amn[k], _BIG))
                omx_ref[pl.ds(d_prev, 1)] = jnp.maximum(
                    omx_ref[pl.ds(d_prev, 1)], tmx[None]
                )
                omn_ref[pl.ds(d_prev, 1)] = jnp.minimum(
                    omn_ref[pl.ds(d_prev, 1)], tmn[None]
                )

            reuse = d == tags[j]
            amx[j] = jnp.where(reuse, jnp.maximum(amx[j], mmx), mmx)
            amn[j] = jnp.where(reuse, jnp.minimum(amn[j], mmn), mmn)
            tags[j] = d
            d_prev = d
        return (d_prev, *amx, *amn, *tags)

    zmx = jnp.full(omx_ref.shape[1:], -_BIG, jnp.float32)
    zmn = jnp.full(omn_ref.shape[1:], _BIG, jnp.float32)
    d_last, *state = jax.lax.fori_loop(
        0, te // NACC, body,
        (0,) + (zmx,) * NACC + (zmn,) * NACC + (jnp.int32(-1),) * NACC,
    )
    amx = state[:NACC]
    amn = state[NACC : 2 * NACC]
    tags = state[2 * NACC :]
    tmx = jnp.full(omx_ref.shape[1:], -_BIG, jnp.float32)
    tmn = jnp.full(omn_ref.shape[1:], _BIG, jnp.float32)
    for k in range(NACC):
        sel = tags[k] == d_last
        tmx = jnp.maximum(tmx, jnp.where(sel, amx[k], -_BIG))
        tmn = jnp.minimum(tmn, jnp.where(sel, amn[k], _BIG))
    omx_ref[pl.ds(d_last, 1)] = jnp.maximum(omx_ref[pl.ds(d_last, 1)], tmx[None])
    omn_ref[pl.ds(d_last, 1)] = jnp.minimum(omn_ref[pl.ds(d_last, 1)], tmn[None])


def _kernel_gather_maxmin_ilv(
    cr_ref, meta_hbm, w_hbm, data_ref, rel_ref, omx_ref, omn_ref,
    mbuf, wbuf, msems, wsems, xblk, xsems,
    *, mode: str, num_chunks: int,
):
    """Run-interleaved fused max+min forward: lane-owned run segments — the
    shared-tag machinery of the contiguous body (2 selects + a 2K-combine
    flush per row change) collapses to one combine-RMW pair per segment.
    Results stay bitwise identical to separate max/min kernels."""
    c = pl.program_id(0)
    slot = jax.lax.rem(c, 2)
    nxt = jax.lax.rem(c + 1, 2)

    @pl.when(cr_ref[0, c] != cr_ref[1, c])
    def _():
        omx_ref[...] = jnp.full_like(omx_ref, -_BIG)
        omn_ref[...] = jnp.full_like(omn_ref, _BIG)

    @pl.when(c == 0)
    def _():
        md, wd = _meta_dmas(meta_hbm, w_hbm, mbuf, wbuf, msems, wsems, 0, 0)
        md.start()
        wd.start()

    md, wd = _meta_dmas(meta_hbm, w_hbm, mbuf, wbuf, msems, wsems, c, slot)
    md.wait()
    wd.wait()

    @pl.when(c + 1 < num_chunks)
    def _():
        md2, wd2 = _meta_dmas(meta_hbm, w_hbm, mbuf, wbuf, msems, wsems, c + 1, nxt)
        md2.start()
        wd2.start()

    bslot = _stream_preamble(cr_ref, data_ref, xblk, xsems, c)
    te = mbuf.shape[-1]

    def body(q, carry):
        pds = list(carry[:NACC])
        amx = list(carry[NACC : 2 * NACC])
        amn = list(carry[2 * NACC :])
        for j in range(NACC):
            i = q * NACC + j
            gi, ai, d, start = _decode_meta_ilv(mbuf, slot, i)
            xrow = xblk[bslot, gi]
            w = wbuf[slot, 0, i]
            if mode == "mul_rel":
                msg = rel_ref[ai] * xrow
            else:
                msg = rel_ref[ai] + xrow
            msg = msg.astype(jnp.float32) * w
            valid = mbuf[slot, 3, i] != 0
            mmx = jnp.where(valid, msg, -_BIG)
            mmn = jnp.where(valid, msg, _BIG)

            @pl.when(start)
            def _(pd=pds[j], ax=amx[j], an=amn[j]):
                omx_ref[pl.ds(pd, 1)] = jnp.maximum(
                    omx_ref[pl.ds(pd, 1)], ax[None]
                )
                omn_ref[pl.ds(pd, 1)] = jnp.minimum(
                    omn_ref[pl.ds(pd, 1)], an[None]
                )

            amx[j] = jnp.where(start, mmx, jnp.maximum(amx[j], mmx))
            amn[j] = jnp.where(start, mmn, jnp.minimum(amn[j], mmn))
            pds[j] = d
        return (*pds, *amx, *amn)

    zmx = jnp.full(omx_ref.shape[1:], -_BIG, jnp.float32)
    zmn = jnp.full(omn_ref.shape[1:], _BIG, jnp.float32)
    state = jax.lax.fori_loop(
        0, te // NACC, body,
        (jnp.int32(0),) * NACC + (zmx,) * NACC + (zmn,) * NACC,
    )
    pds = state[:NACC]
    amx = state[NACC : 2 * NACC]
    amn = state[2 * NACC :]
    for j in range(NACC):
        omx_ref[pl.ds(pds[j], 1)] = jnp.maximum(
            omx_ref[pl.ds(pds[j], 1)], amx[j][None]
        )
        omn_ref[pl.ds(pds[j], 1)] = jnp.minimum(
            omn_ref[pl.ds(pds[j], 1)], amn[j][None]
        )


def _kernel_gather_addsq_ilv(
    cr_ref, meta_hbm, w_hbm, data_ref, rel_ref, os_ref, oq_ref,
    mbuf, wbuf, msems, wsems, mark_s, mark_q, xblk, xsems,
    *, mode: str, num_chunks: int,
):
    """Run-interleaved fused sum + sum-of-squares forward (distmult):
    per-lane telescoping marks for both moments; padding carries w=0."""
    assert mode == "mul_rel", mode
    c = pl.program_id(0)
    slot = jax.lax.rem(c, 2)
    nxt = jax.lax.rem(c + 1, 2)

    @pl.when(cr_ref[0, c] != cr_ref[1, c])
    def _():
        os_ref[...] = jnp.zeros_like(os_ref)
        oq_ref[...] = jnp.zeros_like(oq_ref)

    @pl.when(c == 0)
    def _():
        md, wd = _meta_dmas(meta_hbm, w_hbm, mbuf, wbuf, msems, wsems, 0, 0)
        md.start()
        wd.start()

    md, wd = _meta_dmas(meta_hbm, w_hbm, mbuf, wbuf, msems, wsems, c, slot)
    md.wait()
    wd.wait()

    @pl.when(c + 1 < num_chunks)
    def _():
        md2, wd2 = _meta_dmas(meta_hbm, w_hbm, mbuf, wbuf, msems, wsems, c + 1, nxt)
        md2.start()
        wd2.start()

    bslot = _stream_preamble(cr_ref, data_ref, xblk, xsems, c)
    te = mbuf.shape[-1]
    mark_s[...] = jnp.zeros_like(mark_s)
    mark_q[...] = jnp.zeros_like(mark_q)

    def body(q, carry):
        pds = list(carry[:NACC])
        acs = list(carry[NACC : 2 * NACC])
        acq = list(carry[2 * NACC :])
        for j in range(NACC):
            i = q * NACC + j
            gi, ai, d, start = _decode_meta_ilv(mbuf, slot, i)
            xrow = xblk[bslot, gi]
            w = wbuf[slot, 0, i]
            msg = (rel_ref[ai] * xrow).astype(jnp.float32)
            mw = msg * w

            @pl.when(start)
            def _(pd=pds[j], asj=acs[j], aqj=acq[j], j=j):
                os_ref[pl.ds(pd, 1)] = (
                    os_ref[pl.ds(pd, 1)]
                    + (asj - mark_s[pl.ds(j, 1)][0])[None]
                )
                oq_ref[pl.ds(pd, 1)] = (
                    oq_ref[pl.ds(pd, 1)]
                    + (aqj - mark_q[pl.ds(j, 1)][0])[None]
                )
                mark_s[pl.ds(j, 1)] = asj[None]
                mark_q[pl.ds(j, 1)] = aqj[None]

            acs[j] = acs[j] + mw
            acq[j] = acq[j] + msg * mw
            pds[j] = d
        return (*pds, *acs, *acq)

    zrow = jnp.zeros(os_ref.shape[1:], jnp.float32)
    state = jax.lax.fori_loop(
        0, te // NACC, body,
        (jnp.int32(0),) * NACC + (zrow,) * (2 * NACC),
    )
    pds = state[:NACC]
    acs = state[NACC : 2 * NACC]
    acq = state[2 * NACC :]
    for j in range(NACC):
        os_ref[pl.ds(pds[j], 1)] = (
            os_ref[pl.ds(pds[j], 1)]
            + (acs[j] - mark_s[pl.ds(j, 1)][0])[None]
        )
        oq_ref[pl.ds(pds[j], 1)] = (
            oq_ref[pl.ds(pds[j], 1)]
            + (acq[j] - mark_q[pl.ds(j, 1)][0])[None]
        )


def _kernel_gather_addsq_vmem(
    cr_ref, meta_hbm, w_hbm, data_ref, rel_ref, os_ref, oq_ref,
    mbuf, wbuf, msems, wsems, mark_s, mark_q, xblk, xsems,
    *, mode: str, num_chunks: int, packed: bool = False,
):
    """Fused sum + sum-of-squares forward over the blocked-source layout
    (distmult only): s = sum(msg*w), sq = sum(msg^2*w) with msg = rel*x —
    pna's first and second moments from ONE x stream and one message
    compute, where the two-call formulation streams x twice and computes
    rel^2/x^2 elementwise copies besides (models/layers.py pna branch).
    Telescoping multi-accumulator bodies with separate marks per output."""
    assert mode == "mul_rel", mode
    c = pl.program_id(0)
    slot = jax.lax.rem(c, 2)
    nxt = jax.lax.rem(c + 1, 2)

    @pl.when(cr_ref[0, c] != cr_ref[1, c])
    def _():
        os_ref[...] = jnp.zeros_like(os_ref)
        oq_ref[...] = jnp.zeros_like(oq_ref)

    @pl.when(c == 0)
    def _():
        md, wd = _meta_dmas(meta_hbm, w_hbm, mbuf, wbuf, msems, wsems, 0, 0)
        md.start()
        wd.start()

    md, wd = _meta_dmas(meta_hbm, w_hbm, mbuf, wbuf, msems, wsems, c, slot)
    md.wait()
    wd.wait()

    @pl.when(c + 1 < num_chunks)
    def _():
        md2, wd2 = _meta_dmas(meta_hbm, w_hbm, mbuf, wbuf, msems, wsems, c + 1, nxt)
        md2.start()
        wd2.start()

    bslot = _stream_preamble(cr_ref, data_ref, xblk, xsems, c)
    te = mbuf.shape[-1]

    def body(q, carry):
        d_prev, *state = carry
        acs = list(state[:NACC])
        acq = list(state[NACC:])
        for j in range(NACC):
            i = q * NACC + j
            gi, ai, d = _decode_meta(mbuf, slot, i, packed)
            xrow = xblk[bslot, gi]
            w = wbuf[slot, 0, i]
            msg = (rel_ref[ai] * xrow).astype(jnp.float32)
            mw = msg * w
            flush = d != d_prev

            @pl.when(flush)
            def _(d_prev=d_prev, acs=tuple(acs), acq=tuple(acq)):
                ts = acs[0]
                tq = acq[0]
                for k in range(1, NACC):
                    ts = ts + acs[k]
                    tq = tq + acq[k]
                os_ref[pl.ds(d_prev, 1)] = (
                    os_ref[pl.ds(d_prev, 1)] + (ts - mark_s[...])[None]
                )
                oq_ref[pl.ds(d_prev, 1)] = (
                    oq_ref[pl.ds(d_prev, 1)] + (tq - mark_q[...])[None]
                )
                mark_s[...] = ts
                mark_q[...] = tq

            acs[j] = acs[j] + mw
            acq[j] = acq[j] + msg * mw
            d_prev = d
        return (d_prev, *acs, *acq)

    zrow = jnp.zeros(os_ref.shape[1:], jnp.float32)
    mark_s[...] = jnp.zeros_like(mark_s)
    mark_q[...] = jnp.zeros_like(mark_q)
    d_last, *state = jax.lax.fori_loop(
        0, te // NACC, body, (0,) + (zrow,) * (2 * NACC)
    )
    acs, acq = state[:NACC], state[NACC:]
    ts = acs[0]
    tq = acq[0]
    for k in range(1, NACC):
        ts = ts + acs[k]
        tq = tq + acq[k]
    os_ref[pl.ds(d_last, 1)] = (
        os_ref[pl.ds(d_last, 1)] + (ts - mark_s[...])[None]
    )
    oq_ref[pl.ds(d_last, 1)] = (
        oq_ref[pl.ds(d_last, 1)] + (tq - mark_q[...])[None]
    )


# ---------------------------------------------------------------------------
# blocked-layout kernel options, with measured outcomes (bench workload,
# te=512, tv=1024, kernel_floor + in-situ):
#   * packed metadata: one SMEM load per edge (gather << 21 | aux << 10 |
#     row_local) instead of three — kernel_floor v6/v8 measured -1.1 cyc/edge.
#     Enabled whenever the static bounds fit (block_rows/tile_rows <= 1024,
#     relation rows < 2048; max packed value is exactly 2^31 - 1).
#   * direct per-edge RMW (no flush branch / telescoping) looked better on
#     the synthetic uniform-runlen floor (v7/v8 16.9-18.0 cyc/edge vs
#     v3_multiacc8 21.2 at runlen 2) but LOST in situ (fwd 19.2 ms vs 18.5,
#     bwd 20.4 vs 18.4): real KG destinations are hub-dominated, so most
#     EDGES sit in long same-destination runs where telescoping amortizes to
#     ~0 while back-to-back same-row RMW serializes on a true dependency.
#     The telescoping bodies below therefore stay; direct variants live only
#     in script/diagnostics/kernel_floor.py.
#   * manual bucket-lookahead streaming: the blocked layouts' source blocks
#     are double-buffered by the kernel itself (schedule precomputed in
#     cr_pairs rows 3-6) — the next bucket's block DMA is issued a whole
#     bucket (~5 chunks) ahead, where BlockSpec pipelining's one-chunk
#     lookahead left ~half the stream unhidden at bucket boundaries.
# ---------------------------------------------------------------------------


def _decode_meta(mbuf, slot, i, packed: bool):
    if packed:
        m = mbuf[slot, 0, i]
        return m >> 21, (m >> 10) & 2047, m & 1023
    return mbuf[slot, 0, i], mbuf[slot, 1, i], mbuf[slot, 2, i]


def _cplx_mul(a, b):
    """Complex multiply over PLANAR rows: the first half of a row's feature
    tiles is the real plane, the second half imaginary (_planarize). Rows
    must be covered by ONE feature pass so the halves stay together."""
    fh = a.shape[0] // 2
    ar, ai = a[:fh], a[fh:]
    br, bi = b[:fh], b[fh:]
    return jnp.concatenate([ar * br - ai * bi, ar * bi + ai * br], axis=0)


def _cplx_conj_mul(a, b):
    """conj(a) * b over planar rows (the rotate backward's message)."""
    fh = a.shape[0] // 2
    ar, ai = a[:fh], a[fh:]
    br, bi = b[:fh], b[fh:]
    return jnp.concatenate([ar * br + ai * bi, ar * bi - ai * br], axis=0)


def _stream_preamble(cr_ref, data_hbm, xblk, xsems, c):
    """Issue/wait the manual block-stream DMAs for this chunk (see schedule
    rows above). Returns the buffer slot holding this bucket's block."""
    bslot = cr_ref[4, c]

    @pl.when(cr_ref[3, c] == 1)
    def _():
        @pl.when(c == 0)
        def _():
            pltpu.make_async_copy(
                data_hbm.at[cr_ref[2, c]], xblk.at[bslot], xsems.at[bslot]
            ).start()

        @pl.when(cr_ref[6, c] == 1)
        def _():
            pltpu.make_async_copy(
                data_hbm.at[cr_ref[5, c]], xblk.at[1 - bslot],
                xsems.at[1 - bslot],
            ).start()

        pltpu.make_async_copy(
            data_hbm.at[cr_ref[2, c]], xblk.at[bslot], xsems.at[bslot]
        ).wait()

    return bslot


# ---------------------------------------------------------------------------
# kernel template C: fused backward — one pass over the src-sorted (rev)
# layout produces BOTH gradients. Key observation: with edges sorted by src,
# the output row tile of d_input[src] is exactly the x row range the
# d_relation SDDMM needs, so x arrives as a pipelined VMEM block instead of
# per-edge gathers; only g[dst] rows are DMA'd. d_relation accumulates into a
# constant-indexed second output flushed once at the end.
# ---------------------------------------------------------------------------


def _kernel_bwd_fused(
    cr_ref, meta_hbm, w_hbm, g_hbm, rel_ref, x_ref, dx_ref, dr_ref,
    mbuf, wbuf, msems, wsems, gbuf, sems, mark_ref, xrow_ref,
    *, mode: str, num_chunks: int
):
    """meta rows: (0: dst index to gather from g, 1: etype, 2: src row_local).
    mode 'mul' only: dx += w*rel[r]*g[dst]; dr[r] += w*x[src]*g[dst]
    (transe's gradients ride the gather1 template + rel layout instead)."""
    assert mode == "mul", "fused backward covers distmult only (transe rides gather1)"
    c = pl.program_id(0)
    slot = jax.lax.rem(c, 2)
    nxt = jax.lax.rem(c + 1, 2)

    @pl.when(cr_ref[0, c] != cr_ref[1, c])
    def _():
        dx_ref[...] = jnp.zeros_like(dx_ref)

    @pl.when(c == 0)
    def _():
        dr_ref[...] = jnp.zeros_like(dr_ref)
        md, wd = _meta_dmas(meta_hbm, w_hbm, mbuf, wbuf, msems, wsems, 0, 0)
        md.start()
        wd.start()

    md, wd = _meta_dmas(meta_hbm, w_hbm, mbuf, wbuf, msems, wsems, c, slot)
    md.wait()
    wd.wait()

    @pl.when(c + 1 < num_chunks)
    def _():
        md2, wd2 = _meta_dmas(meta_hbm, w_hbm, mbuf, wbuf, msems, wsems, c + 1, nxt)
        md2.start()
        wd2.start()

    te = mbuf.shape[-1]
    ngroups = te // GROUP

    def start_group(g):
        gslot = jax.lax.rem(g, NGRP)
        for j in range(GROUP):
            pltpu.make_async_copy(
                g_hbm.at[mbuf[slot, 0, g * GROUP + j]],
                gbuf.at[gslot * GROUP + j],
                sems.at[gslot],
            ).start()

    def wait_group(g):
        gslot = jax.lax.rem(g, NGRP)
        pltpu.make_async_copy(
            gbuf.at[pl.ds(gslot * GROUP, GROUP)],
            gbuf.at[pl.ds(gslot * GROUP, GROUP)],
            sems.at[gslot],
        ).wait()

    for g in range(NGRP):
        start_group(g)

    # multi-accumulator telescoping dx (edges are src-sorted; see
    # _kernel_one_gather): all row-change work — dx flush, mark snapshot,
    # current-src x row refresh — lives in the flush branch, so the per-edge
    # path is load-FMA into a static rotation of NACC accumulators.
    mark_ref[...] = jnp.zeros_like(mark_ref)

    def body(g, carry):
        d_prev, *accs = carry
        accs = list(accs)
        gslot = jax.lax.rem(g, NGRP)
        wait_group(g)

        @pl.when(g + NGRP < ngroups)
        def _():
            start_group(g + NGRP)

        for j in range(GROUP):
            i = g * GROUP + j
            grow = gbuf[gslot * GROUP + j]
            w = wbuf[slot, 0, i]
            r = mbuf[slot, 1, i]
            d = mbuf[slot, 2, i]
            flush = d != d_prev

            @pl.when(flush)
            def _(d_prev=d_prev, accs=tuple(accs), d=d):
                total = accs[0]
                for k in range(1, NACC):
                    total = total + accs[k]
                dx_ref[pl.ds(d_prev, 1)] = (
                    dx_ref[pl.ds(d_prev, 1)] + (total - mark_ref[...])[None]
                )
                mark_ref[...] = total
                xrow_ref[...] = x_ref[d]

            # mode is always "mul" here (asserted in the template body):
            # transe's d_input/d_relation ride the gather1 path instead
            gw = grow * w
            dx_msg = rel_ref[r] * gw
            dr_msg = xrow_ref[...] * gw
            accs[j % NACC] = accs[j % NACC] + dx_msg
            dr_ref[pl.ds(r, 1)] = dr_ref[pl.ds(r, 1)] + dr_msg[None]
            d_prev = d
        return (d_prev, *accs)

    # d_prev starts at -1 so the first edge always "flushes" (loading its x
    # row); the flush write dynamic-slices at -1, which clamps to row 0 and
    # adds a zero difference — harmless.
    zrow = jnp.zeros(dx_ref.shape[1:], jnp.float32)
    d_last, *accs = jax.lax.fori_loop(
        0, ngroups, body, (-1,) + (zrow,) * NACC
    )
    total = accs[0]
    for k in range(1, NACC):
        total = total + accs[k]
    dx_ref[pl.ds(d_last, 1)] = (
        dx_ref[pl.ds(d_last, 1)] + (total - mark_ref[...])[None]
    )


# ---------------------------------------------------------------------------
# kernel template D: argext backward for max/min aggregation. Same structure
# as the fused add backward (src-sorted layout, x rows arrive as the output
# block), but each edge gathers a PACKED [2, ft, 128] row: the upstream
# gradient g[dst] and the saved forward extremum out[dst] ride one DMA. An
# edge receives gradient only on the feature lanes where its own recomputed
# message equals the extremum (the reference CUDA kernel's argext backward,
# /root/reference README "compiled kernels"; ties all receive gradient).
# ---------------------------------------------------------------------------


def _kernel_bwd_minmax(
    cr_ref, meta_hbm, w_hbm, go_hbm, rel_ref, x_ref, dx_ref, dr_ref,
    mbuf, wbuf, msems, wsems, gbuf, sems, mark_ref, xrow_ref,
    *, mode: str, num_chunks: int
):
    """meta rows: (0: dst index into go, 1: etype, 2: src row_local, 3: valid).
    mode 'mul': msg = w*rel[r]*x; sel lanes get dx += rel*g*w, dr += x*g*w.
    mode 'add': msg = w*(rel[r]+x); sel lanes get dx += g*w, dr += g*w."""
    c = pl.program_id(0)
    slot = jax.lax.rem(c, 2)
    nxt = jax.lax.rem(c + 1, 2)

    @pl.when(cr_ref[0, c] != cr_ref[1, c])
    def _():
        dx_ref[...] = jnp.zeros_like(dx_ref)

    @pl.when(c == 0)
    def _():
        dr_ref[...] = jnp.zeros_like(dr_ref)
        md, wd = _meta_dmas(meta_hbm, w_hbm, mbuf, wbuf, msems, wsems, 0, 0)
        md.start()
        wd.start()

    md, wd = _meta_dmas(meta_hbm, w_hbm, mbuf, wbuf, msems, wsems, c, slot)
    md.wait()
    wd.wait()

    @pl.when(c + 1 < num_chunks)
    def _():
        md2, wd2 = _meta_dmas(meta_hbm, w_hbm, mbuf, wbuf, msems, wsems, c + 1, nxt)
        md2.start()
        wd2.start()

    te = mbuf.shape[-1]
    ngroups = te // GROUP

    def start_group(g):
        gslot = jax.lax.rem(g, NGRP)
        for j in range(GROUP):
            pltpu.make_async_copy(
                go_hbm.at[mbuf[slot, 0, g * GROUP + j]],
                gbuf.at[gslot * GROUP + j],
                sems.at[gslot],
            ).start()

    def wait_group(g):
        gslot = jax.lax.rem(g, NGRP)
        pltpu.make_async_copy(
            gbuf.at[pl.ds(gslot * GROUP, GROUP)],
            gbuf.at[pl.ds(gslot * GROUP, GROUP)],
            sems.at[gslot],
        ).wait()

    for g in range(NGRP):
        start_group(g)

    # dx accumulation is a SUM even though the forward aggregation is an
    # extremum — the same multi-accumulator telescoping as the fused add
    # backward applies (the serial dx_acc select chain was half the sum
    # path's speed). Row-change work (dx flush, mark snapshot, current-src x
    # row refresh) lives in the flush branch; the per-edge path is
    # gather + recompute + compare + FMA into a static NACC rotation.
    mark_ref[...] = jnp.zeros_like(mark_ref)

    def body(g, carry):
        d_prev, *accs = carry
        accs = list(accs)
        gslot = jax.lax.rem(g, NGRP)
        wait_group(g)

        @pl.when(g + NGRP < ngroups)
        def _():
            start_group(g + NGRP)

        for j in range(GROUP):
            i = g * GROUP + j
            grow = gbuf[gslot * GROUP + j, 0]
            orow = gbuf[gslot * GROUP + j, 1]
            w = wbuf[slot, 0, i]
            r = mbuf[slot, 1, i]
            d = mbuf[slot, 2, i]
            flush = d != d_prev

            @pl.when(flush)
            def _(d_prev=d_prev, accs=tuple(accs), d=d):
                total = accs[0]
                for k in range(1, NACC):
                    total = total + accs[k]
                dx_ref[pl.ds(d_prev, 1)] = (
                    dx_ref[pl.ds(d_prev, 1)] + (total - mark_ref[...])[None]
                )
                mark_ref[...] = total
                xrow_ref[...] = x_ref[d]

            x_row = xrow_ref[...]
            if mode == "mul":
                msg = (rel_ref[r] * x_row).astype(jnp.float32) * w
            else:
                msg = (rel_ref[r] + x_row).astype(jnp.float32) * w
            sel = (msg == orow).astype(jnp.float32)
            gw = grow * (w * sel)
            if mode == "mul":
                dx_msg = rel_ref[r] * gw
                dr_msg = x_row * gw
            else:
                dx_msg = gw
                dr_msg = gw
            accs[j % NACC] = accs[j % NACC] + dx_msg
            dr_ref[pl.ds(r, 1)] = dr_ref[pl.ds(r, 1)] + dr_msg[None]
            d_prev = d
        return (d_prev, *accs)

    zrow = jnp.zeros(dx_ref.shape[1:], jnp.float32)
    d_last, *accs = jax.lax.fori_loop(
        0, ngroups, body, (-1,) + (zrow,) * NACC
    )
    total = accs[0]
    for k in range(1, NACC):
        total = total + accs[k]
    dx_ref[pl.ds(d_last, 1)] = (
        dx_ref[pl.ds(d_last, 1)] + (total - mark_ref[...])[None]
    )


def _kernel_bwd_minmax_vmem(
    cr_ref, meta_hbm, w_hbm, go_ref, rel_ref, x_ref, dx_ref, dr_ref,
    mbuf, wbuf, msems, wsems, mark_ref, xrow_ref,
    *, mode: str, num_chunks: int
):
    """VMEM-resident go variant (small graphs / relation graphs)."""
    c = pl.program_id(0)
    slot = jax.lax.rem(c, 2)
    nxt = jax.lax.rem(c + 1, 2)

    @pl.when(cr_ref[0, c] != cr_ref[1, c])
    def _():
        dx_ref[...] = jnp.zeros_like(dx_ref)

    @pl.when(c == 0)
    def _():
        dr_ref[...] = jnp.zeros_like(dr_ref)
        md, wd = _meta_dmas(meta_hbm, w_hbm, mbuf, wbuf, msems, wsems, 0, 0)
        md.start()
        wd.start()

    md, wd = _meta_dmas(meta_hbm, w_hbm, mbuf, wbuf, msems, wsems, c, slot)
    md.wait()
    wd.wait()

    @pl.when(c + 1 < num_chunks)
    def _():
        md2, wd2 = _meta_dmas(meta_hbm, w_hbm, mbuf, wbuf, msems, wsems, c + 1, nxt)
        md2.start()
        wd2.start()

    te = mbuf.shape[-1]

    # telescoped NACC-rotation dx — see _kernel_bwd_minmax
    mark_ref[...] = jnp.zeros_like(mark_ref)

    def body(q, carry):
        d_prev, *accs = carry
        accs = list(accs)
        for j in range(NACC):
            i = q * NACC + j
            grow = go_ref[mbuf[slot, 0, i], 0]
            orow = go_ref[mbuf[slot, 0, i], 1]
            w = wbuf[slot, 0, i]
            r = mbuf[slot, 1, i]
            d = mbuf[slot, 2, i]
            flush = d != d_prev

            @pl.when(flush)
            def _(d_prev=d_prev, accs=tuple(accs), d=d):
                total = accs[0]
                for k in range(1, NACC):
                    total = total + accs[k]
                dx_ref[pl.ds(d_prev, 1)] = (
                    dx_ref[pl.ds(d_prev, 1)] + (total - mark_ref[...])[None]
                )
                mark_ref[...] = total
                xrow_ref[...] = x_ref[d].astype(jnp.float32)

            x_row = xrow_ref[...]
            if mode == "mul":
                msg = (rel_ref[r] * x_row).astype(jnp.float32) * w
            else:
                msg = (rel_ref[r] + x_row).astype(jnp.float32) * w
            sel = (msg == orow).astype(jnp.float32)
            gw = grow.astype(jnp.float32) * (w * sel)
            if mode == "mul":
                dx_msg = rel_ref[r] * gw
                dr_msg = x_row * gw
            else:
                dx_msg = gw
                dr_msg = gw
            accs[j] = accs[j] + dx_msg
            dr_ref[pl.ds(r, 1)] = dr_ref[pl.ds(r, 1)] + dr_msg[None]
            d_prev = d
        return (d_prev, *accs)

    zrow = jnp.zeros(dx_ref.shape[1:], jnp.float32)
    d_last, *accs = jax.lax.fori_loop(
        0, te // NACC, body, (-1,) + (zrow,) * NACC
    )
    total = accs[0]
    for k in range(1, NACC):
        total = total + accs[k]
    dx_ref[pl.ds(d_last, 1)] = (
        dx_ref[pl.ds(d_last, 1)] + (total - mark_ref[...])[None]
    )


# ---------------------------------------------------------------------------
# callers
# ---------------------------------------------------------------------------


def _feature_tiles(F_pad: int, rel_rows: int, layout: CsrLayout) -> int:
    """Pick a feature tile width keeping VMEM in budget. Wide tiles matter:
    every extra feature pass re-pays the per-edge scalar/DMA overhead, so the
    budget is set high (v5e has 128 MB VMEM) to make F=4096 single-pass."""
    budget = 48 * 1024 * 1024 // 4  # f32 words
    per_f = rel_rows + 2 * layout.tile_rows + NGRP * GROUP + 8
    tf = max(_LANE, (budget // per_f) // _LANE * _LANE)
    return min(F_pad, tf)


def _pack_meta_packed(layout: CsrLayout, index_chunks, second):
    """Single-word metadata for the direct-RMW blocked kernels:
    gather << 21 | aux << 10 | row_local (one SMEM load per edge instead of
    three). Caller checks the static bounds: gather < 1024 (block-local),
    aux < 2048, row_local < 1024. Max value is exactly 2^31 - 1 — no sign
    overflow. Rows 1-3 keep the unpacked fields (same [C, 4, TE] DMA shape)."""
    packed = (index_chunks << 21) | (second << 10) | layout.row_local
    return jnp.stack(
        [packed, second, layout.row_local, layout.valid.astype(jnp.int32)],
        axis=1,
    )


def _packed_ok(layout: CsrLayout, rel_rows: int) -> bool:
    return (0 < layout.block_rows <= 1024 and layout.tile_rows <= 1024
            and rel_rows < 2048)


def _pack_meta_ilv(layout: CsrLayout, index_chunks, second):
    """Interleaved-layout metadata: the packed word additionally carries the
    segment-start flag in the SIGN bit (start << 31 | gather << 21 |
    aux << 10 | row_local — decode masks make the flag free). Requires the
    same bounds as _pack_meta_packed; interleaved layouts are only built
    when they hold. Row 3 keeps the valid flag (extremum padding mask)."""
    start = layout.start.astype(jnp.int32)
    packed = ((start << 31) | (index_chunks << 21) | (second << 10)
              | layout.row_local)
    return jnp.stack(
        [packed, second, layout.row_local, layout.valid.astype(jnp.int32)],
        axis=1,
    )


def _pack_meta(layout: CsrLayout, index_chunks, second):
    """[C, 4, TE] int32: (gather index, aux/second index, row offset, valid).
    4 rows because i32 HBM slices must align to the sublane tiling; the valid
    flag distinguishes alignment padding from real weight-0 edges (max/min
    aggregation must treat padding as identity but weight-0 edges as 0)."""
    return jnp.stack(
        [index_chunks, second, layout.row_local,
         layout.valid.astype(jnp.int32)], axis=1
    )


def rspmm_gather1(
    data: jnp.ndarray,
    relation: Optional[jnp.ndarray],
    w_chunks: jnp.ndarray,
    layout: CsrLayout,
    index_chunks: jnp.ndarray,
    mode: str,
    interpret: Optional[bool] = None,
    compute_dtype=jnp.float32,
    agg: str = "add",
) -> jnp.ndarray:
    """Template-A reduction. data: [Vin, F]; relation: [R, F] or None.
    Returns [padded_rows, F] float32 (accumulation is always f32;
    compute_dtype=bf16 halves gather bytes and message VPU work).
    agg max/min rows with no valid edges come back +-_BIG — callers mask
    them to 0 after combining any hot/cold splits."""
    interpret = _interpret_default() if interpret is None else interpret
    if agg != "add":
        compute_dtype = jnp.float32  # backward equality needs exact replay
    data = data.astype(compute_dtype)
    if relation is not None:
        relation = relation.astype(compute_dtype)
    V, F = data.shape
    F_pad = _pad_lane(F)
    if jnp.dtype(compute_dtype) == jnp.bfloat16:
        # bf16 HBM memrefs tile (16, 128): feature slices (DMA'd rows and
        # per-pass columns) must cover multiples of 8 [*, 128] tiles or
        # Mosaic rejects the descriptor ("slice must be aligned to tiling
        # (8)") — pad F so every pass, including the last, is 8-tile wide
        F_pad = -(-F_pad // (8 * _LANE)) * (8 * _LANE)
    te = layout.tile_edges
    tv = layout.tile_rows
    if F_pad != F:
        data = jnp.pad(data, ((0, 0), (0, F_pad - F)))
        if relation is not None:
            relation = jnp.pad(relation, ((0, 0), (0, F_pad - F)))
    if relation is not None:
        r_pad = -(-relation.shape[0] // 8) * 8
        if r_pad != relation.shape[0]:
            relation = jnp.pad(relation, ((0, r_pad - relation.shape[0]), (0, 0)))
    rel_rows = 0 if relation is None else relation.shape[0]
    tf = _feature_tiles(F_pad, rel_rows, layout)
    if jnp.dtype(compute_dtype) == jnp.bfloat16:
        tf = max(8 * _LANE, (tf // (8 * _LANE)) * (8 * _LANE))

    # aux (edge type) is only read by the *_rel message modes; when relation
    # is None (e.g. transe backward d_input) pack zeros so the packed-word
    # bound aux < 2048 holds by construction — layout.aux can carry edge
    # types up to 2*num_relations-1, which _packed_ok never sees here.
    aux = layout.aux if relation is not None else jnp.zeros_like(layout.aux)
    meta = _pack_meta(layout, index_chunks, aux)
    w3 = w_chunks[:, None, :]  # [C, 1, TE]
    # small gathered operand (relation graphs): keep it VMEM-resident and
    # skip per-edge DMAs entirely
    v_pad = -(-V // 8) * 8
    blocked = layout.block_rows > 0
    data_vmem = (not blocked and
                 (v_pad + rel_rows + 2 * tv + 16) * tf * 4 <= _VMEM_DATA_BUDGET)
    if blocked:
        # blocked-source streaming (build_blocked_layout): gathers read a
        # VMEM-resident source block, double-buffered by the kernel itself a
        # whole bucket ahead (_stream_preamble); metadata is packed to one
        # SMEM word per edge when the bounds fit
        if layout.interleave:
            assert layout.interleave == NACC and _packed_ok(layout, rel_rows)
            kernel = functools.partial(
                _kernel_one_gather_ilv, mode=mode,
                num_chunks=layout.num_chunks, agg=agg,
            )
            meta = _pack_meta_ilv(layout, index_chunks, aux)
        else:
            packed = _packed_ok(layout, rel_rows)
            kernel = functools.partial(
                _kernel_one_gather_vmem, mode=mode,
                num_chunks=layout.num_chunks, agg=agg, packed=packed,
                manual_stream=True,
            )
            if packed:
                meta = _pack_meta_packed(layout, index_chunks, aux)
        vg = layout.padded_gather_rows
        if data.shape[0] < vg:
            data = jnp.pad(data, ((0, vg - data.shape[0]), (0, 0)))
        # budget: out tile + streamed block (double-buffered) + relation
        per_f = rel_rows + 2 * tv + 2 * layout.block_rows + 16
        tf = max(_LANE, ((80 * 1024 * 1024 // 4) // per_f) // _LANE * _LANE)
        tf = min(F_pad, tf)
        if jnp.dtype(compute_dtype) == jnp.bfloat16:
            tf = max(8 * _LANE, (tf // (8 * _LANE)) * (8 * _LANE))
        if mode == "rot_rel" and tf < F_pad:
            raise ValueError(
                f"rotate needs one feature pass to keep the planar re/im "
                f"halves together: F={F_pad} exceeds the {tf}-wide VMEM "
                f"budget at block_rows={layout.block_rows}"
            )
    elif data_vmem:
        if mode == "rot_rel":
            raise ValueError("rotate rides the blocked layouts only")
        kernel = functools.partial(
            _kernel_one_gather_vmem, mode=mode, num_chunks=layout.num_chunks,
            agg=agg,
        )
        if v_pad != V:
            data = jnp.pad(data, ((0, v_pad - V), (0, 0)))
    else:
        if mode == "rot_rel":
            raise ValueError("rotate rides the blocked layouts only")
        kernel = functools.partial(
            _kernel_one_gather, mode=mode, num_chunks=layout.num_chunks,
            agg=agg,
        )
    pieces = []
    for f0 in range(0, F_pad, tf):
        fw = min(tf, F_pad - f0)
        ft = fw // _LANE  # rows carried as [ft, 128] tiles (no sublane padding)
        if blocked:
            # [num_blocks, block_rows, ft, lane] in HBM; the kernel streams
            # whole blocks into its own double buffer (see _stream_preamble)
            data_f = data[:, f0 : f0 + fw].reshape(
                -1, layout.block_rows, ft, _LANE
            )
            data_spec = pl.BlockSpec(memory_space=pl.ANY)
        elif data_vmem:
            data_f = data[:, f0 : f0 + fw].reshape(-1, ft, _LANE)
            data_spec = pl.BlockSpec((v_pad, ft, _LANE), lambda c, cr: (0, 0, 0),
                                     memory_space=pltpu.VMEM)
        else:
            data_f = data[:, f0 : f0 + fw].reshape(V, ft, _LANE)
            data_spec = pl.BlockSpec(memory_space=pl.ANY)
        xbuf_dtype = data.dtype
        in_specs = [
            pl.BlockSpec(memory_space=pl.ANY),  # meta in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # weights in HBM
            data_spec,
        ]
        args = [meta, w3, data_f]
        scratch = [
            pltpu.SMEM((2, 4, te), jnp.int32),
            pltpu.SMEM((2, 1, te), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ]
        if not (data_vmem or blocked):
            scratch += [
                pltpu.VMEM((NGRP * GROUP, ft, _LANE), xbuf_dtype),
                pltpu.SemaphoreType.DMA((NGRP,)),
            ]
        # telescoping mark (agg='add'; allocated but untouched for min/max);
        # interleaved bodies keep one mark row per lane
        mark_shape = ((NACC, ft, _LANE) if (blocked and layout.interleave)
                      else (ft, _LANE))
        scratch.append(pltpu.VMEM(mark_shape, jnp.float32))
        if blocked:  # manual block-stream double buffer + its DMA sems
            scratch += [
                pltpu.VMEM((2, layout.block_rows, ft, _LANE), xbuf_dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ]
        if relation is not None:
            in_specs.append(
                pl.BlockSpec((rel_rows, ft, _LANE), lambda c, cr: (0, 0, 0),
                             memory_space=pltpu.VMEM)
            )
            args.append(relation[:, f0 : f0 + fw].reshape(rel_rows, ft, _LANE))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(layout.num_chunks,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (tv, ft, _LANE), lambda c, cr: (cr[0, c], 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=scratch,
        )
        piece = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (layout.padded_rows, ft, _LANE), jnp.float32
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(layout.cr_pairs, *args)
        pieces.append(piece.reshape(layout.padded_rows, fw))
    out = pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces, axis=1)
    return out[:, :F]


def rspmm_gather_maxmin(
    data: jnp.ndarray,
    relation: jnp.ndarray,
    w_chunks: jnp.ndarray,
    layout: CsrLayout,
    index_chunks,
    mode: str,
    interpret: Optional[bool] = None,
):
    """Fused max+min forward over the BLOCKED (fwd_blk) layout: one x-block
    stream and one message compute produce both extrema
    (_kernel_gather_maxmin_vmem). f32 only (argext backward equality).
    Returns (out_max, out_min), each [padded_rows, F] pre-masking (empty
    rows come back -+_BIG — callers mask to 0)."""
    interpret = _interpret_default() if interpret is None else interpret
    assert layout.block_rows > 0, "fused maxmin needs a blocked layout"
    assert mode in ("mul_rel", "add_rel"), mode
    data = data.astype(jnp.float32)
    relation = relation.astype(jnp.float32)
    V, F = data.shape
    F_pad = _pad_lane(F)
    te = layout.tile_edges
    tv = layout.tile_rows
    if F_pad != F:
        data = jnp.pad(data, ((0, 0), (0, F_pad - F)))
        relation = jnp.pad(relation, ((0, 0), (0, F_pad - F)))
    r_pad = -(-relation.shape[0] // 8) * 8
    if r_pad != relation.shape[0]:
        relation = jnp.pad(relation, ((0, r_pad - relation.shape[0]), (0, 0)))
    rel_rows = relation.shape[0]

    packed = _packed_ok(layout, rel_rows)
    if layout.interleave:
        assert layout.interleave == NACC and packed
        meta = _pack_meta_ilv(layout, index_chunks, layout.aux)
        kernel = functools.partial(
            _kernel_gather_maxmin_ilv, mode=mode,
            num_chunks=layout.num_chunks,
        )
    else:
        if packed:
            meta = _pack_meta_packed(layout, index_chunks, layout.aux)
        else:
            meta = _pack_meta(layout, index_chunks, layout.aux)
        kernel = functools.partial(
            _kernel_gather_maxmin_vmem, mode=mode,
            num_chunks=layout.num_chunks, packed=packed,
        )
    w3 = w_chunks[:, None, :]
    vg = layout.padded_gather_rows
    if data.shape[0] < vg:
        data = jnp.pad(data, ((0, vg - data.shape[0]), (0, 0)))
    # two output tiles + streamed block (double-buffered) + relation
    # every feature pass repays the full per-edge scalar decode + flush
    # machinery — push VMEM to stay single-pass at F=4096 (the pair working
    # set at tv=1024 / block<=1024 is ~109 MB of the chip's 128)
    pair_budget_mb = int(os.environ.get("RSPMM_PAIR_VMEM_MB", "108"))
    per_f = rel_rows + 4 * tv + 2 * layout.block_rows + 16
    tf = max(_LANE,
             ((pair_budget_mb * 1024 * 1024 // 4) // per_f) // _LANE * _LANE)
    tf = min(F_pad, tf)
    mx_pieces, mn_pieces = [], []
    for f0 in range(0, F_pad, tf):
        fw = min(tf, F_pad - f0)
        ft = fw // _LANE
        data_f = data[:, f0 : f0 + fw].reshape(
            -1, layout.block_rows, ft, _LANE
        )
        scratch = [
            pltpu.SMEM((2, 4, te), jnp.int32),
            pltpu.SMEM((2, 1, te), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((2, layout.block_rows, ft, _LANE), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(layout.num_chunks,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # meta
                pl.BlockSpec(memory_space=pl.ANY),  # weights
                pl.BlockSpec(memory_space=pl.ANY),  # blocked x stream
                pl.BlockSpec((rel_rows, ft, _LANE), lambda c, cr: (0, 0, 0),
                             memory_space=pltpu.VMEM),  # relation
            ],
            out_specs=(
                pl.BlockSpec((tv, ft, _LANE), lambda c, cr: (cr[0, c], 0, 0),
                             memory_space=pltpu.VMEM),  # max
                pl.BlockSpec((tv, ft, _LANE), lambda c, cr: (cr[0, c], 0, 0),
                             memory_space=pltpu.VMEM),  # min
            ),
            scratch_shapes=scratch,
        )
        mx_p, mn_p = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct(
                    (layout.padded_rows, ft, _LANE), jnp.float32),
                jax.ShapeDtypeStruct(
                    (layout.padded_rows, ft, _LANE), jnp.float32),
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=(pair_budget_mb + 16) * 1024 * 1024,
            ),
            interpret=interpret,
        )(
            layout.cr_pairs,
            meta,
            w3,
            data_f,
            relation[:, f0 : f0 + fw].reshape(rel_rows, ft, _LANE),
        )
        mx_pieces.append(mx_p.reshape(layout.padded_rows, fw))
        mn_pieces.append(mn_p.reshape(layout.padded_rows, fw))
    mx = mx_pieces[0] if len(mx_pieces) == 1 else jnp.concatenate(mx_pieces, 1)
    mn = mn_pieces[0] if len(mn_pieces) == 1 else jnp.concatenate(mn_pieces, 1)
    return mx[:, :F], mn[:, :F]


def rspmm_gather_addsq(
    data: jnp.ndarray,
    relation: jnp.ndarray,
    w_chunks: jnp.ndarray,
    layout: CsrLayout,
    index_chunks,
    interpret: Optional[bool] = None,
):
    """Fused sum + sum-of-squares forward over the BLOCKED (fwd_blk) layout
    (distmult message): returns (s, sq) = (sum(msg*w), sum(msg^2*w)), each
    [padded_rows, F] float32."""
    interpret = _interpret_default() if interpret is None else interpret
    assert layout.block_rows > 0, "fused addsq needs a blocked layout"
    data = data.astype(jnp.float32)
    relation = relation.astype(jnp.float32)
    V, F = data.shape
    F_pad = _pad_lane(F)
    te = layout.tile_edges
    tv = layout.tile_rows
    if F_pad != F:
        data = jnp.pad(data, ((0, 0), (0, F_pad - F)))
        relation = jnp.pad(relation, ((0, 0), (0, F_pad - F)))
    r_pad = -(-relation.shape[0] // 8) * 8
    if r_pad != relation.shape[0]:
        relation = jnp.pad(relation, ((0, r_pad - relation.shape[0]), (0, 0)))
    rel_rows = relation.shape[0]

    packed = _packed_ok(layout, rel_rows)
    if layout.interleave:
        assert layout.interleave == NACC and packed
        meta = _pack_meta_ilv(layout, index_chunks, layout.aux)
        kernel = functools.partial(
            _kernel_gather_addsq_ilv, mode="mul_rel",
            num_chunks=layout.num_chunks,
        )
    else:
        if packed:
            meta = _pack_meta_packed(layout, index_chunks, layout.aux)
        else:
            meta = _pack_meta(layout, index_chunks, layout.aux)
        kernel = functools.partial(
            _kernel_gather_addsq_vmem, mode="mul_rel",
            num_chunks=layout.num_chunks, packed=packed,
        )
    w3 = w_chunks[:, None, :]
    vg = layout.padded_gather_rows
    if data.shape[0] < vg:
        data = jnp.pad(data, ((0, vg - data.shape[0]), (0, 0)))
    # every feature pass repays the full per-edge scalar decode + flush
    # machinery — push VMEM to stay single-pass at F=4096 (the pair working
    # set at tv=1024 / block<=1024 is ~109 MB of the chip's 128)
    pair_budget_mb = int(os.environ.get("RSPMM_PAIR_VMEM_MB", "108"))
    per_f = rel_rows + 4 * tv + 2 * layout.block_rows + 16
    tf = max(_LANE,
             ((pair_budget_mb * 1024 * 1024 // 4) // per_f) // _LANE * _LANE)
    tf = min(F_pad, tf)

    s_pieces, q_pieces = [], []
    for f0 in range(0, F_pad, tf):
        fw = min(tf, F_pad - f0)
        ft = fw // _LANE
        data_f = data[:, f0 : f0 + fw].reshape(
            -1, layout.block_rows, ft, _LANE
        )
        mk = (NACC, ft, _LANE) if layout.interleave else (ft, _LANE)
        scratch = [
            pltpu.SMEM((2, 4, te), jnp.int32),
            pltpu.SMEM((2, 1, te), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM(mk, jnp.float32),  # mark_s (per lane if interleaved)
            pltpu.VMEM(mk, jnp.float32),  # mark_q
            pltpu.VMEM((2, layout.block_rows, ft, _LANE), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(layout.num_chunks,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # meta
                pl.BlockSpec(memory_space=pl.ANY),  # weights
                pl.BlockSpec(memory_space=pl.ANY),  # blocked x stream
                pl.BlockSpec((rel_rows, ft, _LANE), lambda c, cr: (0, 0, 0),
                             memory_space=pltpu.VMEM),  # relation
            ],
            out_specs=(
                pl.BlockSpec((tv, ft, _LANE), lambda c, cr: (cr[0, c], 0, 0),
                             memory_space=pltpu.VMEM),  # s
                pl.BlockSpec((tv, ft, _LANE), lambda c, cr: (cr[0, c], 0, 0),
                             memory_space=pltpu.VMEM),  # sq
            ),
            scratch_shapes=scratch,
        )
        s_p, q_p = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct(
                    (layout.padded_rows, ft, _LANE), jnp.float32),
                jax.ShapeDtypeStruct(
                    (layout.padded_rows, ft, _LANE), jnp.float32),
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=(pair_budget_mb + 16) * 1024 * 1024,
            ),
            interpret=interpret,
        )(
            layout.cr_pairs,
            meta,
            w3,
            data_f,
            relation[:, f0 : f0 + fw].reshape(rel_rows, ft, _LANE),
        )
        s_pieces.append(s_p.reshape(layout.padded_rows, fw))
        q_pieces.append(q_p.reshape(layout.padded_rows, fw))
    s = s_pieces[0] if len(s_pieces) == 1 else jnp.concatenate(s_pieces, 1)
    q = q_pieces[0] if len(q_pieces) == 1 else jnp.concatenate(q_pieces, 1)
    return s[:, :F], q[:, :F]


def rspmm_bwd_fused(
    x_flat: jnp.ndarray,
    g_flat: jnp.ndarray,
    relation_flat: jnp.ndarray,
    w_chunks: jnp.ndarray,
    layout: CsrLayout,
    interpret: Optional[bool] = None,
    compute_dtype=jnp.float32,
    mode: str = "mul",
):
    """Fused distmult (mode='mul') or rotate (mode='rotate', planar rows)
    backward over the src-sorted layout.
    Returns (dx [padded_rows, F], dr [R_pad, F]) in float32."""
    interpret = _interpret_default() if interpret is None else interpret
    x_flat = x_flat.astype(compute_dtype)
    g_flat = g_flat.astype(compute_dtype)
    relation_flat = relation_flat.astype(compute_dtype)
    V, F = x_flat.shape
    F_pad = _pad_lane(F)
    if jnp.dtype(compute_dtype) == jnp.bfloat16:
        # bf16 HBM memrefs tile (16, 128): see rspmm_gather1 — 8-tile-align
        # every feature pass
        F_pad = -(-F_pad // (8 * _LANE)) * (8 * _LANE)
    te, tv = layout.tile_edges, layout.tile_rows
    if F_pad != F:
        x_flat = jnp.pad(x_flat, ((0, 0), (0, F_pad - F)))
        g_flat = jnp.pad(g_flat, ((0, 0), (0, F_pad - F)))
        relation_flat = jnp.pad(relation_flat, ((0, 0), (0, F_pad - F)))
    r_pad = -(-relation_flat.shape[0] // 8) * 8
    if r_pad != relation_flat.shape[0]:
        relation_flat = jnp.pad(
            relation_flat, ((0, r_pad - relation_flat.shape[0]), (0, 0))
        )
    # x padded to the full row-tile range (block-indexed by output tile)
    if x_flat.shape[0] < layout.padded_rows:
        x_flat = jnp.pad(x_flat, ((0, layout.padded_rows - x_flat.shape[0]), (0, 0)))

    # feature tiling: rel + dr + double-buffered x/dx blocks + gather buffers
    budget = 48 * 1024 * 1024 // 4
    per_f = 2 * r_pad + 4 * tv + NGRP * GROUP + 8
    tf = max(_LANE, (budget // per_f) // _LANE * _LANE)
    tf = min(F_pad, tf)
    if jnp.dtype(compute_dtype) == jnp.bfloat16:
        tf = max(8 * _LANE, (tf // (8 * _LANE)) * (8 * _LANE))

    meta = _pack_meta(layout, layout.gather1, layout.aux)
    w3 = w_chunks[:, None, :]
    Vg = g_flat.shape[0]
    vg_pad = -(-Vg // 8) * 8
    blocked = layout.block_rows > 0
    g_vmem = (not blocked and
              (vg_pad + 2 * r_pad + 4 * tv + 16) * tf * 4 <= _VMEM_DATA_BUDGET)
    if blocked:
        # blocked-destination streaming: per-edge g gathers read a VMEM
        # block the kernel double-buffers a bucket ahead (_stream_preamble);
        # metadata packed to one SMEM word when the bounds fit
        if layout.interleave:
            assert layout.interleave == NACC and _packed_ok(layout, r_pad)
            kernel = functools.partial(
                _kernel_bwd_fused_ilv, mode=mode,
                num_chunks=layout.num_chunks,
            )
            meta = _pack_meta_ilv(layout, layout.gather1, layout.aux)
        else:
            packed = _packed_ok(layout, r_pad)
            kernel = functools.partial(
                _kernel_bwd_fused_vmem, mode=mode,
                num_chunks=layout.num_chunks, packed=packed,
                manual_stream=True,
            )
            if packed:
                meta = _pack_meta_packed(layout, layout.gather1, layout.aux)
        vg = layout.padded_gather_rows
        if g_flat.shape[0] < vg:
            g_flat = jnp.pad(g_flat, ((0, vg - g_flat.shape[0]), (0, 0)))
        # every f-pass repays the full per-edge scalar decode + flush
        # machinery: size tf to stay single-pass at F=4096 (the flagship
        # width) — push data VMEM to the edge; small streamed g blocks
        # (block_rows <= 256) make the F=4096 working set fit in one pass
        bw_budget_mb = int(os.environ.get("RSPMM_BWD_VMEM_MB", "96"))
        per_f = 2 * r_pad + 4 * tv + 2 * layout.block_rows + 16
        tf = max(_LANE,
                 ((bw_budget_mb * 1024 * 1024 // 4) // per_f) // _LANE * _LANE)
        tf = min(F_pad, tf)
        if jnp.dtype(compute_dtype) == jnp.bfloat16:
            tf = max(8 * _LANE, (tf // (8 * _LANE)) * (8 * _LANE))
        if mode == "rotate" and tf < F_pad:
            raise ValueError(
                f"rotate backward needs one feature pass: F={F_pad} exceeds "
                f"the {tf}-wide VMEM budget"
            )
    elif g_vmem:
        if mode == "rotate":
            raise ValueError("rotate rides the blocked layouts only")
        kernel = functools.partial(
            _kernel_bwd_fused_vmem, mode="mul", num_chunks=layout.num_chunks
        )
        if vg_pad != Vg:
            g_flat = jnp.pad(g_flat, ((0, vg_pad - Vg), (0, 0)))
    else:
        if mode == "rotate":
            raise ValueError("rotate rides the blocked layouts only")
        kernel = functools.partial(
            _kernel_bwd_fused, mode="mul", num_chunks=layout.num_chunks
        )
    dx_pieces, dr_pieces = [], []
    for f0 in range(0, F_pad, tf):
        fw = min(tf, F_pad - f0)
        ft = fw // _LANE
        if blocked:
            # [num_blocks, block_rows, ft, lane] in HBM; kernel-managed
            # double buffer (see _stream_preamble)
            g_arg = g_flat[:, f0 : f0 + fw].reshape(
                -1, layout.block_rows, ft, _LANE
            )
            g_spec = pl.BlockSpec(memory_space=pl.ANY)
            scratch = [
                pltpu.SMEM((2, 4, te), jnp.int32),
                pltpu.SMEM((2, 1, te), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ]
        elif g_vmem:
            g_arg = g_flat[:, f0 : f0 + fw].reshape(-1, ft, _LANE)
            g_spec = pl.BlockSpec((vg_pad, ft, _LANE), lambda c, cr: (0, 0, 0),
                                  memory_space=pltpu.VMEM)
            scratch = [
                pltpu.SMEM((2, 4, te), jnp.int32),
                pltpu.SMEM((2, 1, te), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ]
        else:
            g_arg = g_flat[:, f0 : f0 + fw].reshape(Vg, ft, _LANE)
            g_spec = pl.BlockSpec(memory_space=pl.ANY)
            scratch = [
                pltpu.SMEM((2, 4, te), jnp.int32),
                pltpu.SMEM((2, 1, te), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.VMEM((NGRP * GROUP, ft, _LANE), g_flat.dtype),
                pltpu.SemaphoreType.DMA((NGRP,)),
            ]
        ilv = blocked and layout.interleave
        scratch += [
            # telescoping mark + current src x row (one per lane when
            # interleaved)
            pltpu.VMEM((NACC, ft, _LANE) if ilv else (ft, _LANE), jnp.float32),
            pltpu.VMEM((NACC, ft, _LANE) if ilv else (ft, _LANE), x_flat.dtype),
        ]
        if blocked:  # manual g-block double buffer + its DMA sems
            scratch += [
                pltpu.VMEM((2, layout.block_rows, ft, _LANE), g_flat.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(layout.num_chunks,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # meta
                pl.BlockSpec(memory_space=pl.ANY),  # weights
                g_spec,
                pl.BlockSpec((r_pad, ft, _LANE), lambda c, cr: (0, 0, 0),
                             memory_space=pltpu.VMEM),  # relation
                pl.BlockSpec((tv, ft, _LANE), lambda c, cr: (cr[0, c], 0, 0),
                             memory_space=pltpu.VMEM),  # x row-tile block
            ],
            out_specs=(
                pl.BlockSpec((tv, ft, _LANE), lambda c, cr: (cr[0, c], 0, 0),
                             memory_space=pltpu.VMEM),  # dx
                pl.BlockSpec((r_pad, ft, _LANE), lambda c, cr: (0, 0, 0),
                             memory_space=pltpu.VMEM),  # dr accumulator
            ),
            scratch_shapes=scratch,
        )
        dx_p, dr_p = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct((layout.padded_rows, ft, _LANE), jnp.float32),
                jax.ShapeDtypeStruct((r_pad, ft, _LANE), jnp.float32),
            ),
            compiler_params=pltpu.CompilerParams(
                # blocked: 112 MB of the chip's 128 MB — the single-pass
                # working set at F=4096 (dx/x full tiles + streamed g blocks
                # + dr, all double-buffered) is ~100 MB
                vmem_limit_bytes=(
                    max(112, bw_budget_mb + 10) if blocked else 100
                ) * 1024 * 1024,
            ),
            interpret=interpret,
        )(
            layout.cr_pairs,
            meta,
            w3,
            g_arg,
            relation_flat[:, f0 : f0 + fw].reshape(r_pad, ft, _LANE),
            x_flat[:, f0 : f0 + fw].reshape(layout.padded_rows, ft, _LANE),
        )
        dx_pieces.append(dx_p.reshape(layout.padded_rows, fw))
        dr_pieces.append(dr_p.reshape(r_pad, fw))
    dx = dx_pieces[0] if len(dx_pieces) == 1 else jnp.concatenate(dx_pieces, 1)
    dr = dr_pieces[0] if len(dr_pieces) == 1 else jnp.concatenate(dr_pieces, 1)
    return dx[:, :F], dr[:, :F]


def rspmm_bwd_minmax(
    x_flat: jnp.ndarray,
    g_flat: jnp.ndarray,
    out_flat: jnp.ndarray,
    relation_flat: jnp.ndarray,
    w_chunks: jnp.ndarray,
    layout: CsrLayout,
    mode: str,
    interpret: Optional[bool] = None,
):
    """Argext backward for max/min aggregation over the src-sorted layout.
    out_flat is the saved forward extremum (post empty-row masking — masked
    rows have no incident edges, so no edge can match them). f32 only: the
    per-lane equality between the recomputed message and the stored extremum
    must reproduce the forward bit-for-bit.
    Returns (dx [padded_rows, F], dr [R_pad, F])."""
    interpret = _interpret_default() if interpret is None else interpret
    x_flat = x_flat.astype(jnp.float32)
    g_flat = g_flat.astype(jnp.float32)
    out_flat = out_flat.astype(jnp.float32)
    relation_flat = relation_flat.astype(jnp.float32)
    V, F = x_flat.shape
    F_pad = _pad_lane(F)
    te, tv = layout.tile_edges, layout.tile_rows
    if F_pad != F:
        x_flat = jnp.pad(x_flat, ((0, 0), (0, F_pad - F)))
        g_flat = jnp.pad(g_flat, ((0, 0), (0, F_pad - F)))
        out_flat = jnp.pad(out_flat, ((0, 0), (0, F_pad - F)))
        relation_flat = jnp.pad(relation_flat, ((0, 0), (0, F_pad - F)))
    r_pad = -(-relation_flat.shape[0] // 8) * 8
    if r_pad != relation_flat.shape[0]:
        relation_flat = jnp.pad(
            relation_flat, ((0, r_pad - relation_flat.shape[0]), (0, 0))
        )
    if x_flat.shape[0] < layout.padded_rows:
        x_flat = jnp.pad(x_flat, ((0, layout.padded_rows - x_flat.shape[0]), (0, 0)))

    budget = 48 * 1024 * 1024 // 4
    per_f = 2 * r_pad + 4 * tv + 2 * NGRP * GROUP + 8  # packed (g, x) buffer
    tf = min(F_pad, max(_LANE, (budget // per_f) // _LANE * _LANE))

    meta = _pack_meta(layout, layout.gather1, layout.aux)
    w3 = w_chunks[:, None, :]
    Vg = g_flat.shape[0]
    vg_pad = -(-Vg // 8) * 8
    g_vmem = (2 * vg_pad + 2 * r_pad + 4 * tv + 16) * tf * 4 <= _VMEM_DATA_BUDGET
    if g_vmem:
        kernel = functools.partial(
            _kernel_bwd_minmax_vmem, mode=mode, num_chunks=layout.num_chunks
        )
        if vg_pad != Vg:
            g_flat = jnp.pad(g_flat, ((0, vg_pad - Vg), (0, 0)))
            out_flat = jnp.pad(out_flat, ((0, vg_pad - Vg), (0, 0)))
    else:
        kernel = functools.partial(
            _kernel_bwd_minmax, mode=mode, num_chunks=layout.num_chunks
        )
    dx_pieces, dr_pieces = [], []
    for f0 in range(0, F_pad, tf):
        fw = min(tf, F_pad - f0)
        ft = fw // _LANE
        # pack g and the forward extremum side by side: one DMA per edge
        go = jnp.stack(
            [g_flat[:, f0 : f0 + fw].reshape(-1, ft, _LANE),
             out_flat[: g_flat.shape[0], f0 : f0 + fw].reshape(-1, ft, _LANE)],
            axis=1,
        )  # [Vg(_pad), 2, ft, LANE]
        if g_vmem:
            go_spec = pl.BlockSpec((vg_pad, 2, ft, _LANE),
                                   lambda c, cr: (0, 0, 0, 0),
                                   memory_space=pltpu.VMEM)
            scratch = [
                pltpu.SMEM((2, 4, te), jnp.int32),
                pltpu.SMEM((2, 1, te), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ]
        else:
            go_spec = pl.BlockSpec(memory_space=pl.ANY)
            scratch = [
                pltpu.SMEM((2, 4, te), jnp.int32),
                pltpu.SMEM((2, 1, te), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.VMEM((NGRP * GROUP, 2, ft, _LANE), jnp.float32),
                pltpu.SemaphoreType.DMA((NGRP,)),
            ]
        scratch += [
            pltpu.VMEM((ft, _LANE), jnp.float32),  # telescoping mark
            pltpu.VMEM((ft, _LANE), jnp.float32),  # current src x row
        ]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(layout.num_chunks,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # meta
                pl.BlockSpec(memory_space=pl.ANY),  # weights
                go_spec,
                pl.BlockSpec((r_pad, ft, _LANE), lambda c, cr: (0, 0, 0),
                             memory_space=pltpu.VMEM),  # relation
                pl.BlockSpec((tv, ft, _LANE), lambda c, cr: (cr[0, c], 0, 0),
                             memory_space=pltpu.VMEM),  # x row-tile block
            ],
            out_specs=(
                pl.BlockSpec((tv, ft, _LANE), lambda c, cr: (cr[0, c], 0, 0),
                             memory_space=pltpu.VMEM),  # dx
                pl.BlockSpec((r_pad, ft, _LANE), lambda c, cr: (0, 0, 0),
                             memory_space=pltpu.VMEM),  # dr accumulator
            ),
            scratch_shapes=scratch,
        )
        dx_p, dr_p = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct((layout.padded_rows, ft, _LANE), jnp.float32),
                jax.ShapeDtypeStruct((r_pad, ft, _LANE), jnp.float32),
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(
            layout.cr_pairs,
            meta,
            w3,
            go,
            relation_flat[:, f0 : f0 + fw].reshape(r_pad, ft, _LANE),
            x_flat[:, f0 : f0 + fw].reshape(layout.padded_rows, ft, _LANE),
        )
        dx_pieces.append(dx_p.reshape(layout.padded_rows, fw))
        dr_pieces.append(dr_p.reshape(r_pad, fw))
    dx = dx_pieces[0] if len(dx_pieces) == 1 else jnp.concatenate(dx_pieces, 1)
    dr = dr_pieces[0] if len(dr_pieces) == 1 else jnp.concatenate(dr_pieces, 1)
    return dx[:, :F], dr[:, :F]


def rspmm_bwd_minmax_blk(
    x_flat: jnp.ndarray,
    g_flat: jnp.ndarray,
    out_flat: jnp.ndarray,
    relation_flat: jnp.ndarray,
    w_chunks: jnp.ndarray,
    layout: CsrLayout,
    mode: str,
    interpret: Optional[bool] = None,
    g2_flat: Optional[jnp.ndarray] = None,
    out2_flat: Optional[jnp.ndarray] = None,
    kind: str = "argext",
):
    """Blocked-destination argext backward for max/min over the src-sorted
    BLOCKED layout (rev_blk): g and the saved forward extremum stream as
    packed [block_rows, 2, ft, lane] dst blocks a bucket ahead of use
    (_stream_preamble) — zero per-edge DMAs, where template D pays a packed
    [2, ft, lane] gather DMA per edge (the measured bottleneck: the per-edge
    minmax backward streams 2x the fused add backward's gather bytes).
    f32 only (recompute equality must reproduce the forward bit-for-bit).
    Returns (dx [padded_rows, F], dr [R_pad, F])."""
    interpret = _interpret_default() if interpret is None else interpret
    assert layout.block_rows > 0, "needs a blocked (rev_blk) layout"
    pair = g2_flat is not None
    planes = [g_flat, out_flat] + ([g2_flat, out2_flat] if pair else [])
    planes = [p.astype(jnp.float32) for p in planes]
    x_flat = x_flat.astype(jnp.float32)
    relation_flat = relation_flat.astype(jnp.float32)
    V, F = x_flat.shape
    F_pad = _pad_lane(F)
    te, tv = layout.tile_edges, layout.tile_rows
    if F_pad != F:
        x_flat = jnp.pad(x_flat, ((0, 0), (0, F_pad - F)))
        planes = [jnp.pad(p, ((0, 0), (0, F_pad - F))) for p in planes]
        relation_flat = jnp.pad(relation_flat, ((0, 0), (0, F_pad - F)))
    r_pad = -(-relation_flat.shape[0] // 8) * 8
    if r_pad != relation_flat.shape[0]:
        relation_flat = jnp.pad(
            relation_flat, ((0, r_pad - relation_flat.shape[0]), (0, 0))
        )
    if x_flat.shape[0] < layout.padded_rows:
        x_flat = jnp.pad(
            x_flat, ((0, layout.padded_rows - x_flat.shape[0]), (0, 0))
        )
    vg = layout.padded_gather_rows
    planes = [
        jnp.pad(p, ((0, vg - p.shape[0]), (0, 0))) if p.shape[0] < vg
        else p[:vg]
        for p in planes
    ]
    np_ = len(planes)

    packed = _packed_ok(layout, r_pad)
    if packed:
        meta = _pack_meta_packed(layout, layout.gather1, layout.aux)
    else:
        meta = _pack_meta(layout, layout.gather1, layout.aux)
    w3 = w_chunks[:, None, :]
    # the packed (g, out) planes multiply the streamed-block VMEM. Every
    # feature pass repays the full per-edge scalar decode + flush machinery,
    # so single-pass at F=4096 is worth pushing VMEM to the edge — with
    # small streamed blocks (block_rows <= 256) the working set fits the
    # 128 MB chip budget in one pass.
    budget_mb = int(os.environ.get("RSPMM_MM_BWD_VMEM_MB", "112"))
    per_f = 2 * r_pad + 4 * tv + 2 * np_ * layout.block_rows + 16
    tf = max(_LANE, ((budget_mb * 1024 * 1024 // 4) // per_f) // _LANE * _LANE)
    tf = min(F_pad, tf)

    flags = dict(
        argext=kind == "argext" and not pair,
        argext_pair=kind == "argext" and pair,
        moments=kind == "moments",
    )
    if layout.interleave:
        assert layout.interleave == NACC and packed
        kernel = functools.partial(
            _kernel_bwd_fused_ilv, mode=mode, num_chunks=layout.num_chunks,
            **flags,
        )
        meta = _pack_meta_ilv(layout, layout.gather1, layout.aux)
    else:
        kernel = functools.partial(
            _kernel_bwd_fused_vmem, mode=mode, num_chunks=layout.num_chunks,
            packed=packed, manual_stream=True, **flags,
        )
    dx_pieces, dr_pieces = [], []
    for f0 in range(0, F_pad, tf):
        fw = min(tf, F_pad - f0)
        ft = fw // _LANE
        # [num_blocks, block_rows, np, ft, lane]: one block DMA streams the
        # upstream gradient(s) and saved extremum(-a) for the dst block
        go = jnp.stack(
            [p[:, f0 : f0 + fw].reshape(-1, layout.block_rows, ft, _LANE)
             for p in planes],
            axis=2,
        )
        mk = (NACC, ft, _LANE) if layout.interleave else (ft, _LANE)
        scratch = [
            pltpu.SMEM((2, 4, te), jnp.int32),
            pltpu.SMEM((2, 1, te), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM(mk, jnp.float32),   # telescoping mark (per lane)
            pltpu.VMEM(mk, jnp.float32),   # current src x row (per lane)
            pltpu.VMEM((2, layout.block_rows, np_, ft, _LANE), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(layout.num_chunks,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # meta
                pl.BlockSpec(memory_space=pl.ANY),  # weights
                pl.BlockSpec(memory_space=pl.ANY),  # packed (g, out) blocks
                pl.BlockSpec((r_pad, ft, _LANE), lambda c, cr: (0, 0, 0),
                             memory_space=pltpu.VMEM),  # relation
                pl.BlockSpec((tv, ft, _LANE), lambda c, cr: (cr[0, c], 0, 0),
                             memory_space=pltpu.VMEM),  # x row-tile block
            ],
            out_specs=(
                pl.BlockSpec((tv, ft, _LANE), lambda c, cr: (cr[0, c], 0, 0),
                             memory_space=pltpu.VMEM),  # dx
                pl.BlockSpec((r_pad, ft, _LANE), lambda c, cr: (0, 0, 0),
                             memory_space=pltpu.VMEM),  # dr accumulator
            ),
            scratch_shapes=scratch,
        )
        dx_p, dr_p = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct(
                    (layout.padded_rows, ft, _LANE), jnp.float32),
                jax.ShapeDtypeStruct((r_pad, ft, _LANE), jnp.float32),
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=max(112, budget_mb + 10) * 1024 * 1024,
            ),
            interpret=interpret,
        )(
            layout.cr_pairs,
            meta,
            w3,
            go,
            relation_flat[:, f0 : f0 + fw].reshape(r_pad, ft, _LANE),
            x_flat[:, f0 : f0 + fw].reshape(layout.padded_rows, ft, _LANE),
        )
        dx_pieces.append(dx_p.reshape(layout.padded_rows, fw))
        dr_pieces.append(dr_p.reshape(r_pad, fw))
    dx = dx_pieces[0] if len(dx_pieces) == 1 else jnp.concatenate(dx_pieces, 1)
    dr = dr_pieces[0] if len(dr_pieces) == 1 else jnp.concatenate(dr_pieces, 1)
    return dx[:, :F], dr[:, :F]


# ---------------------------------------------------------------------------
# high-level entry points (flattened [*, F] views of [V, B, D] operands)
# ---------------------------------------------------------------------------


def _flat(x):
    return x.reshape(x.shape[0], -1)


def _rel_flat(relation, B):
    if relation.ndim == 2:  # [R, D] shared across batch
        R, D = relation.shape
        return jnp.broadcast_to(relation[:, None, :], (R, B, D)).reshape(R, B * D)
    return relation.reshape(relation.shape[0], -1)  # [R, B, D]


def _weight_chunks(edge_weight, layout: CsrLayout):
    return edge_weight[layout.edge_id] * layout.valid


def _planarize(a):
    """[N, B, D] -> planar flat [N, 2 * pad_lane(B * D/2)]: the real halves
    of every D block first, imaginary second (the split _cplx_mul expects —
    D blocks store re in dims [:D/2] and im in [D/2:], reference
    layer.py:75-80 rotate convention)."""
    N, B, D = a.shape
    d2 = D // 2
    p = a.reshape(N, B, 2, d2).transpose(0, 2, 1, 3).reshape(N, 2, B * d2)
    fh = _pad_lane(B * d2)
    if fh != B * d2:
        p = jnp.pad(p, ((0, 0), (0, 0), (0, fh - B * d2)))
    return p.reshape(N, 2 * fh)


def _deplanarize(a, B, D):
    N = a.shape[0]
    d2 = D // 2
    fh = a.shape[1] // 2
    p = a.reshape(N, 2, fh)[:, :, : B * d2]
    return p.reshape(N, 2, B, d2).transpose(0, 2, 1, 3).reshape(N, B, D)


def _rel3(relation, B, D):
    if relation.ndim == 2:
        return jnp.broadcast_to(relation[:, None, :], (relation.shape[0], B, D))
    return relation


def rspmm_rotate_fwd_pallas(layouts, edge_weight, relation, x, *, num_nodes):
    """RotatE message (complex multiply) forward, sum aggregation. BEYOND
    the reference, whose rotate path always materializes O(E*F) messages
    (/root/reference/ultra/layer.py:112-113, README.md:43): here rotate
    rides the same streamed blocked gather kernel as distmult via a planar
    re/im row layout. Requires blocked layouts and x [V, B, D] with even D."""
    lay = getattr(layouts, "fwd_blk", None)
    assert lay is not None, "pallas rotate needs blocked layouts (fwd_blk)"
    V, B, D = x.shape
    xp = _planarize(x)
    rp = _planarize(_rel3(relation, B, D))
    out = rspmm_gather1(
        xp, rp, _weight_chunks(edge_weight, lay), lay, lay.gather1,
        mode="rot_rel",
    )
    return _deplanarize(out[:num_nodes], B, D)


def rspmm_rotate_bwd_pallas(layouts, edge_weight, relation, x, g):
    """Fused rotate backward: dx = conj(rel) (x) g, dr = conj(x) (x) g —
    one pass over the src-sorted blocked layout, planar rows."""
    rev = getattr(layouts, "rev_blk", None)
    assert rev is not None, "pallas rotate needs blocked layouts (rev_blk)"
    V, B, D = x.shape
    dx_p, dr_p = rspmm_bwd_fused(
        _planarize(x), _planarize(_flat(g).reshape(V, B, D)),
        _planarize(_rel3(relation, B, D)),
        _weight_chunks(edge_weight, rev), rev, mode="rotate",
    )
    dx = _deplanarize(dx_p[:V], B, D)
    R = relation.shape[0]
    dr = _deplanarize(dr_p[:R], B, D)
    if relation.ndim == 2:
        dr = dr.sum(axis=1)
    return dr, dx


def rspmm_fwd_pallas(layouts, edge_weight, relation, x, *, msg, num_nodes,
                     compute_dtype=jnp.float32, agg: str = "add"):
    if msg == "rotate":
        assert agg == "add", "pallas rotate covers sum aggregation"
        return rspmm_rotate_fwd_pallas(
            layouts, edge_weight, relation, x, num_nodes=num_nodes
        )
    # flat mode: x [V, F] with relation [R, F] — the kernels' native layout;
    # callers that keep activations flat skip the [V, B, D] relayout copies
    flat_in = x.ndim == 2
    if flat_in:
        x_flat, rel_flat = x, relation
    else:
        B = x.shape[1]
        x_flat = _flat(x)
        rel_flat = _rel_flat(relation, B)
    mode = "mul_rel" if msg == "mul" else "add_rel"
    # blocked-source streaming: no per-edge DMAs, no hot split needed.
    # All aggregations since round 4: with the old serial extremum body
    # blocked max/min measured SLOWER (78 vs 73 ms: bucketing shortens
    # same-row runs to ~2 edges vs the dst-sorted layout's ~36 and the
    # flush branch dominated), but the tag-multiacc body flipped that —
    # blocked max fwd 19.2 ms vs 23.8 per-edge DMA at the bench shape.
    # RSPMM_MINMAX_BLOCKED=0 forces the per-edge DMA + hot-split path.
    blocked_ok = (agg == "add"
                  or os.environ.get("RSPMM_MINMAX_BLOCKED") != "0")
    if blocked_ok and getattr(layouts, "fwd_blk", None) is not None:
        lay = layouts.fwd_blk
        out = rspmm_gather1(
            x_flat, rel_flat, _weight_chunks(edge_weight, lay), lay,
            lay.gather1, mode=mode, compute_dtype=compute_dtype, agg=agg,
        )
        if agg == "max":
            out = jnp.where(out <= -_BIG / 2, 0.0, out)
        elif agg == "min":
            out = jnp.where(out >= _BIG / 2, 0.0, out)
        out = out[:num_nodes]
        return out if flat_in else out.reshape(num_nodes, *x.shape[1:])
    out = rspmm_gather1(
        x_flat,
        rel_flat,
        _weight_chunks(edge_weight, layouts.fwd),
        layouts.fwd,
        layouts.fwd.gather1,
        mode=mode,
        compute_dtype=compute_dtype,
        agg=agg,
    )
    if layouts.fwd_hot is not None:
        # hot-source edges: their x rows form a small VMEM-resident table
        # (rspmm_gather1 takes the VMEM variant automatically for small data)
        x_hot = x_flat[layouts.hot_ids]
        out_hot = rspmm_gather1(
            x_hot,
            rel_flat,
            _weight_chunks(edge_weight, layouts.fwd_hot),
            layouts.fwd_hot,
            layouts.fwd_hot.gather1,
            mode=mode,
            compute_dtype=compute_dtype,
            agg=agg,
        )
        out = _agg_combine(agg)(out, out_hot)
    if agg == "max":
        out = jnp.where(out <= -_BIG / 2, 0.0, out)
    elif agg == "min":
        out = jnp.where(out >= _BIG / 2, 0.0, out)
    out = out[:num_nodes]
    return out if flat_in else out.reshape(num_nodes, *x.shape[1:])


def rspmm_bwd_pallas(layouts, edge_weight, relation, x, g, *, msg,
                     compute_dtype=jnp.float32):
    """Returns (d_relation, d_input)."""
    if msg == "rotate":
        return rspmm_rotate_bwd_pallas(layouts, edge_weight, relation, x, g)
    flat_in = x.ndim == 2
    if not flat_in:
        B = x.shape[1]
    g_flat = _flat(g)
    if msg == "mul":
        rel_flat = relation if flat_in else _rel_flat(relation, B)
        rev = layouts.rev
        if getattr(layouts, "rev_blk", None) is not None:
            # blocked-destination streaming covers ALL edges (no hot split)
            rev = layouts.rev_blk
            dx_flat, dr_flat = rspmm_bwd_fused(
                _flat(x), g_flat, rel_flat,
                _weight_chunks(edge_weight, rev), rev,
                compute_dtype=compute_dtype,
            )
            dx = dx_flat[: x.shape[0]].reshape(x.shape)
            R = relation.shape[0]
            if flat_in:
                return dr_flat[:R], dx
            dr = dr_flat[:R].reshape(R, *x.shape[1:])
            if relation.ndim == 2:
                dr = dr.sum(axis=1)
            return dr, dx
        dx_flat, dr_flat = rspmm_bwd_fused(
            _flat(x), g_flat, rel_flat,
            _weight_chunks(edge_weight, layouts.rev),
            layouts.rev,
            compute_dtype=compute_dtype,
        )
        if layouts.rev_hot is not None:
            dx_h, dr_h = rspmm_bwd_fused(
                _flat(x), g_flat[layouts.rev_hot_ids], rel_flat,
                _weight_chunks(edge_weight, layouts.rev_hot),
                layouts.rev_hot,
                compute_dtype=compute_dtype,
            )
            dx_flat = dx_flat + dx_h
            dr_flat = dr_flat + dr_h
        dx = dx_flat[: x.shape[0]].reshape(x.shape)
    else:  # transe
        if layouts.rel is None:
            raise ValueError(
                "transe backward needs the relation-sorted layout: build with "
                "include_rel_layout=True (Graph.prepare_pallas)"
            )
        rev_t = layouts.rev
        if getattr(layouts, "rev_blk", None) is not None:
            rev_t = layouts.rev_blk
        dx_flat = rspmm_gather1(
            g_flat, None,
            _weight_chunks(edge_weight, rev_t),
            rev_t, rev_t.gather1, mode="none",
        )
        # blocked layout covers all edges — the hot pass applies only to the
        # cold/hot split of the per-edge DMA layout
        if rev_t is layouts.rev and layouts.rev_hot is not None:
            dx_flat = dx_flat + rspmm_gather1(
                g_flat[layouts.rev_hot_ids], None,
                _weight_chunks(edge_weight, layouts.rev_hot),
                layouts.rev_hot, layouts.rev_hot.gather1, mode="none",
            )
        dx = dx_flat[: x.shape[0]].reshape(x.shape)
        dr_flat = rspmm_gather1(
            g_flat, None,
            _weight_chunks(edge_weight, layouts.rel),
            layouts.rel, layouts.rel.gather2, mode="none",
        )
    R = relation.shape[0]
    if flat_in:
        return dr_flat[:R], dx
    dr = dr_flat[:R].reshape(R, *x.shape[1:])
    if relation.ndim == 2:  # shared relation: sum over batch
        dr = dr.sum(axis=1)
    return dr, dx


def rspmm_bwd_pallas_minmax(layouts, edge_weight, relation, x, out, g, *, msg):
    """Argext backward for max/min aggregation: one fused pass over the
    src-sorted layout(s) yields (d_relation, d_input). `out` is the saved
    forward result [V, B, D] (or flat [V, F] with relation [R, F])."""
    flat_in = x.ndim == 2
    g_flat = _flat(g)
    out_flat = _flat(out)
    rel_flat = relation if flat_in else _rel_flat(relation, x.shape[1])
    mode = "mul" if msg == "mul" else "add"
    # Blocked-destination streaming for the argext backward: with CONTIGUOUS
    # layouts it measured SLOWER than the per-edge packed gathers + hot
    # split (42.9 vs 38.2 ms at the bench shape — rev blocked bucketing
    # shortens same-src runs to ~1-2 where the contiguous flush machinery
    # serializes, and the packed (g, out) pair used to force two feature
    # passes). Round 5 changed both terms: the RUN-INTERLEAVED body flushes
    # once per lane-owned segment and the 112 MB VMEM budget keeps F=4096
    # single-pass, measuring 22.3 ms — the blocked route is therefore the
    # DEFAULT whenever rev_blk is interleaved (39.81 ms max fwd+bwd total =
    # 13.99M edges/s vs 54.96 per-edge), opt-out RSPMM_MINMAX_BLOCKED_BWD=0;
    # contiguous layouts keep the per-edge path unless forced with =1.
    rev_blk = getattr(layouts, "rev_blk", None)
    blk_env = os.environ.get("RSPMM_MINMAX_BLOCKED_BWD")
    use_blk = rev_blk is not None and (
        blk_env == "1"
        or (bool(rev_blk.interleave) and blk_env != "0")
    )
    if use_blk:
        dx_flat, dr_flat = rspmm_bwd_minmax_blk(
            _flat(x), g_flat, out_flat, rel_flat,
            _weight_chunks(edge_weight, layouts.rev_blk),
            layouts.rev_blk, mode=mode,
        )
        dx = dx_flat[: x.shape[0]].reshape(x.shape)
        R = relation.shape[0]
        if flat_in:
            return dr_flat[:R], dx
        dr = dr_flat[:R].reshape(R, *x.shape[1:])
        if relation.ndim == 2:  # shared relation: sum over batch
            dr = dr.sum(axis=1)
        return dr, dx
    dx_flat, dr_flat = rspmm_bwd_minmax(
        _flat(x), g_flat, out_flat, rel_flat,
        _weight_chunks(edge_weight, layouts.rev),
        layouts.rev, mode=mode,
    )
    if layouts.rev_hot is not None:
        dx_h, dr_h = rspmm_bwd_minmax(
            _flat(x), g_flat[layouts.rev_hot_ids],
            out_flat[layouts.rev_hot_ids], rel_flat,
            _weight_chunks(edge_weight, layouts.rev_hot),
            layouts.rev_hot, mode=mode,
        )
        dx_flat = dx_flat + dx_h
        dr_flat = dr_flat + dr_h
    dx = dx_flat[: x.shape[0]].reshape(x.shape)
    R = relation.shape[0]
    if flat_in:
        return dr_flat[:R], dx
    dr = dr_flat[:R].reshape(R, *x.shape[1:])
    if relation.ndim == 2:  # shared relation: sum over batch
        dr = dr.sum(axis=1)
    return dr, dx


def rspmm_fwd_pallas_maxmin(layouts, edge_weight, relation, x, *, msg,
                            num_nodes):
    """Fused max+min forward (both extrema from one stream — see
    _kernel_gather_maxmin_vmem). Requires blocked layouts (fwd_blk);
    msg in ('mul', 'add'). Returns (out_max, out_min) shaped like x rows,
    empty rows masked to 0 (the single-kernel convention)."""
    lay = getattr(layouts, "fwd_blk", None)
    assert lay is not None, "fused maxmin needs blocked layouts (fwd_blk)"
    flat_in = x.ndim == 2
    if flat_in:
        x_flat, rel_flat = x, relation
    else:
        B = x.shape[1]
        x_flat = _flat(x)
        rel_flat = _rel_flat(relation, B)
    mode = "mul_rel" if msg == "mul" else "add_rel"
    mx, mn = rspmm_gather_maxmin(
        x_flat, rel_flat, _weight_chunks(edge_weight, lay), lay, lay.gather1,
        mode=mode,
    )
    mx = jnp.where(mx <= -_BIG / 2, 0.0, mx)[:num_nodes]
    mn = jnp.where(mn >= _BIG / 2, 0.0, mn)[:num_nodes]
    if flat_in:
        return mx, mn
    shp = (num_nodes,) + x.shape[1:]
    return mx.reshape(shp), mn.reshape(shp)


def rspmm_bwd_pallas_maxmin(layouts, edge_weight, relation, x, out_mx,
                            out_mn, g_mx, g_mn, *, msg):
    """Fused argext backward for the max+min pair: ONE pass over the blocked
    src-sorted layout streams (g_max, out_max, g_min, out_min) as packed
    4-plane dst blocks, shares the message recompute between both equality
    gates, and sums the gated gradients before the dx/dr multiplies.
    Falls back to two single-extremum backward passes when blocked layouts
    are absent. Returns (d_relation, d_input) = sums over both outputs."""
    if getattr(layouts, "rev_blk", None) is None:
        dr1, dx1 = rspmm_bwd_pallas_minmax(
            layouts, edge_weight, relation, x, out_mx, g_mx, msg=msg)
        dr2, dx2 = rspmm_bwd_pallas_minmax(
            layouts, edge_weight, relation, x, out_mn, g_mn, msg=msg)
        return dr1 + dr2, dx1 + dx2
    flat_in = x.ndim == 2
    rel_flat = relation if flat_in else _rel_flat(relation, x.shape[1])
    mode = "mul" if msg == "mul" else "add"
    rev = layouts.rev_blk
    dx_flat, dr_flat = rspmm_bwd_minmax_blk(
        _flat(x), _flat(g_mx), _flat(out_mx), rel_flat,
        _weight_chunks(edge_weight, rev), rev, mode=mode,
        g2_flat=_flat(g_mn), out2_flat=_flat(out_mn),
    )
    dx = dx_flat[: x.shape[0]].reshape(x.shape)
    R = relation.shape[0]
    if flat_in:
        return dr_flat[:R], dx
    dr = dr_flat[:R].reshape(R, *x.shape[1:])
    if relation.ndim == 2:  # shared relation: sum over batch
        dr = dr.sum(axis=1)
    return dr, dx


def rspmm_fwd_pallas_addsq(layouts, edge_weight, relation, x, *, num_nodes):
    """Fused (sum, sum-of-squares) forward for the distmult pna moments —
    one blocked pass replaces spmm(rel, x, add) + spmm(rel^2, x^2, add)
    (models/layers.py pna branch). Returns (s, sq) shaped like x rows."""
    lay = getattr(layouts, "fwd_blk", None)
    assert lay is not None, "fused addsq needs blocked layouts (fwd_blk)"
    flat_in = x.ndim == 2
    if flat_in:
        x_flat, rel_flat = x, relation
    else:
        B = x.shape[1]
        x_flat = _flat(x)
        rel_flat = _rel_flat(relation, B)
    s, q = rspmm_gather_addsq(
        x_flat, rel_flat, _weight_chunks(edge_weight, lay), lay, lay.gather1,
    )
    s, q = s[:num_nodes], q[:num_nodes]
    if flat_in:
        return s, q
    shp = (num_nodes,) + x.shape[1:]
    return s.reshape(shp), q.reshape(shp)


def rspmm_bwd_pallas_addsq(layouts, edge_weight, relation, x, g_s, g_sq):
    """Fused moments backward: one pass over the blocked src-sorted layout
    streams (g_s, g_sq) dst-block pairs; both gradients factor through the
    shared inner term w*g_s + 2*msg*w*g_sq (msg = rel*x recomputed from the
    resident x row). Returns (d_relation, d_input)."""
    rev = getattr(layouts, "rev_blk", None)
    assert rev is not None, "fused addsq needs blocked layouts (rev_blk)"
    flat_in = x.ndim == 2
    rel_flat = relation if flat_in else _rel_flat(relation, x.shape[1])
    dx_flat, dr_flat = rspmm_bwd_minmax_blk(
        _flat(x), _flat(g_s), _flat(g_sq), rel_flat,
        _weight_chunks(edge_weight, rev), rev, mode="mul", kind="moments",
    )
    dx = dx_flat[: x.shape[0]].reshape(x.shape)
    R = relation.shape[0]
    if flat_in:
        return dr_flat[:R], dx
    dr = dr_flat[:R].reshape(R, *x.shape[1:])
    if relation.ndim == 2:  # shared relation: sum over batch
        dr = dr.sum(axis=1)
    return dr, dx
