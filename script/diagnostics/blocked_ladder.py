"""Cycles/slot ladder for the BLOCKED streaming forward body on the real
bench workload (VERDICT r4 #2/#3: the floor ladder that existed —
kernel_floor.py — measures a VMEM-resident synthetic at runlen 32; the
production blocked kernel runs the bench layout at mean run length ~4 with a
double-buffered streamed source block, and its in-situ cost was never
decomposed).

Runs strip-down variants of the shipped contiguous blocked add body
(_kernel_one_gather_vmem manual_stream) over the REAL fwd_blk layout:

  b0_full       the shipped telescoping multiacc body
  b1_noflush    no row flush (wrong output: measures the flush share)
  b2_statrow    gather index forced to 0 (dynamic-addressing share)
  b3_statbuf    stream buffer slot forced to 0 (dynamic-buffer share)
  b4_norel      message = xrow (relation-read share)
  b5_floor      acc += const_row * w (loop + FMA floor)
  b6_nosum      flush RMWs acc[0] only (drops the 7-way sum, keeps the RMW)
  b7_nochain    flush keeps ALL ops but writes a fixed scratch row instead
                of the dynamic out row (breaks the out_ref RMW chain)
  b10a_fsplit   FEATURE-SPLIT redesign: 4 slices of [8,128] per edge with
                register accumulators (the multiacc body's 8x[32,128] accs
                cannot be register-resident) and 4 DISJOINT out refs —
                independent flush chains, no 8-way sum; per-slice VMEM
                telescoping marks
  b10b_fsplit   b10a with mark-free keep-FMA reset (acc = acc*keep + msg*w,
                keep = 0 on row change) — no VMEM scratch chains at all

All variants share the real metadata DMA pipeline and the real block-stream
schedule, so deltas are attributable. Writes KERNEL_LADDER.json.

Usage:  python script/diagnostics/blocked_ladder.py [--out FILE]
"""

import argparse
import functools
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

CLOCK_HZ = 940e6  # v5e


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "KERNEL_LADDER.json"))
    ap.add_argument("--variants", default="b0_full,b1_noflush,b2_statrow,"
                    "b3_statbuf,b4_norel,b5_floor")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )

    from bench import build_workload
    from ultra_torchdrug_tpu.ops.csr import build_rspmm_layouts
    from ultra_torchdrug_tpu.ops.rspmm_pallas import (
        NACC, _LANE, _meta_dmas, _pack_meta_packed, _stream_preamble,
    )

    triplets, rel, x = build_workload()
    V, R = 15000, 474
    E = triplets.shape[0]
    ei = np.stack([triplets[:, 0], triplets[:, 1]], 1)
    et = triplets[:, 2]
    layouts = build_rspmm_layouts(ei, et, V, 2 * R, blocked=True,
                                  interleave=0, hot_rows=1024)
    lay = layouts.fwd_blk
    slots = int(np.asarray(lay.valid).size)
    te = lay.tile_edges
    F = 4096
    ft = F // _LANE

    NS = 4  # feature slices for the b10 variants ([8, 128] each at F=4096)

    def make_kernel_fsplit(strip: str):
        def kernel(cr_ref, meta_hbm, w_hbm, data_hbm, rel_ref,
                   o0, o1, o2, o3, mbuf, wbuf, msems, wsems,
                   m0, m1, m2, m3, xblk, xsems):
            outs = (o0, o1, o2, o3)
            marks = (m0, m1, m2, m3)
            c = pl.program_id(0)
            slot = jax.lax.rem(c, 2)
            nxt = jax.lax.rem(c + 1, 2)

            @pl.when(cr_ref[0, c] != cr_ref[1, c])
            def _():
                for o in outs:
                    o[...] = jnp.zeros_like(o)

            @pl.when(c == 0)
            def _():
                md, wd = _meta_dmas(meta_hbm, w_hbm, mbuf, wbuf, msems,
                                    wsems, 0, 0)
                md.start()
                wd.start()

            md, wd = _meta_dmas(meta_hbm, w_hbm, mbuf, wbuf, msems, wsems,
                                c, slot)
            md.wait()
            wd.wait()

            @pl.when(c + 1 < lay.num_chunks)
            def _():
                md2, wd2 = _meta_dmas(meta_hbm, w_hbm, mbuf, wbuf, msems,
                                      wsems, c + 1, nxt)
                md2.start()
                wd2.start()

            bslot = _stream_preamble(cr_ref, data_hbm, xblk, xsems, c)
            sub = ft // NS
            zs = jnp.zeros((sub, _LANE), jnp.float32)
            use_marks = strip == "b10a_fsplit"
            if use_marks:
                for m in marks:
                    m[...] = jnp.zeros_like(m)

            def body(i, carry):
                d_prev, *accs = carry
                accs = list(accs)
                m = mbuf[slot, 0, i]
                gi = m >> 21
                ai = (m >> 10) & 2047
                d = m & 1023
                w = wbuf[slot, 0, i]
                flush = d != d_prev
                if use_marks:
                    # telescoping with per-slice VMEM marks: acc never
                    # resets; flush writes the delta per disjoint out ref
                    @pl.when(flush)
                    def _(d_prev=d_prev, accs=tuple(accs)):
                        for s in range(NS):
                            outs[s][pl.ds(d_prev, 1)] = (
                                outs[s][pl.ds(d_prev, 1)]
                                + (accs[s] - marks[s][...])[None]
                            )
                            marks[s][...] = accs[s]
                    for s in range(NS):
                        xs = xblk[bslot, gi, pl.ds(sub * s, sub)]
                        rs = rel_ref[ai, pl.ds(sub * s, sub)]
                        accs[s] = accs[s] + (rs * xs) * w
                else:
                    # mark-free: flush the whole acc, reset via keep-FMA
                    @pl.when(flush)
                    def _(d_prev=d_prev, accs=tuple(accs)):
                        for s in range(NS):
                            outs[s][pl.ds(d_prev, 1)] = (
                                outs[s][pl.ds(d_prev, 1)] + accs[s][None]
                            )
                    keep = jnp.where(flush, 0.0, 1.0)
                    for s in range(NS):
                        xs = xblk[bslot, gi, pl.ds(sub * s, sub)]
                        rs = rel_ref[ai, pl.ds(sub * s, sub)]
                        accs[s] = accs[s] * keep + (rs * xs) * w
                return (d, *accs)

            d_last, *accs = jax.lax.fori_loop(
                0, te, body, (0,) + (zs,) * NS
            )
            for s in range(NS):
                if use_marks:
                    outs[s][pl.ds(d_last, 1)] = (
                        outs[s][pl.ds(d_last, 1)]
                        + (accs[s] - marks[s][...])[None]
                    )
                else:
                    outs[s][pl.ds(d_last, 1)] = (
                        outs[s][pl.ds(d_last, 1)] + accs[s][None]
                    )

        return kernel

    def make_kernel(strip: str):
        def kernel(cr_ref, meta_hbm, w_hbm, data_hbm, rel_ref, out_ref,
                   mbuf, wbuf, msems, wsems, mark_ref, dummy_ref, xblk,
                   xsems):
            c = pl.program_id(0)
            slot = jax.lax.rem(c, 2)
            nxt = jax.lax.rem(c + 1, 2)

            @pl.when(cr_ref[0, c] != cr_ref[1, c])
            def _():
                out_ref[...] = jnp.zeros_like(out_ref)

            @pl.when(c == 0)
            def _():
                md, wd = _meta_dmas(meta_hbm, w_hbm, mbuf, wbuf, msems,
                                    wsems, 0, 0)
                md.start()
                wd.start()

            md, wd = _meta_dmas(meta_hbm, w_hbm, mbuf, wbuf, msems, wsems,
                                c, slot)
            md.wait()
            wd.wait()

            @pl.when(c + 1 < lay.num_chunks)
            def _():
                md2, wd2 = _meta_dmas(meta_hbm, w_hbm, mbuf, wbuf, msems,
                                      wsems, c + 1, nxt)
                md2.start()
                wd2.start()

            bslot = _stream_preamble(cr_ref, data_hbm, xblk, xsems, c)
            mark_ref[...] = jnp.zeros_like(mark_ref)
            const_row = xblk[0, 0]

            def body(q, carry):
                d_prev, *accs = carry
                accs = list(accs)
                for j in range(NACC):
                    i = q * NACC + j
                    m = mbuf[slot, 0, i]
                    gi = m >> 21
                    ai = (m >> 10) & 2047
                    d = m & 1023
                    w = wbuf[slot, 0, i]
                    if strip == "b6_nosum":
                        flush = d != d_prev

                        @pl.when(flush)
                        def _(d_prev=d_prev, accs=tuple(accs)):
                            total = accs[0]
                            out_ref[pl.ds(d_prev, 1)] = (
                                out_ref[pl.ds(d_prev, 1)]
                                + (total - mark_ref[...])[None]
                            )
                            mark_ref[...] = total
                    elif strip == "b7_nochain":
                        flush = d != d_prev

                        @pl.when(flush)
                        def _(d_prev=d_prev, accs=tuple(accs)):
                            total = accs[0]
                            for k in range(1, NACC):
                                total = total + accs[k]
                            dummy_ref[...] = total - mark_ref[...]
                            mark_ref[...] = total
                    elif strip != "b1_noflush":
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

                    if strip == "b5_floor":
                        msg = const_row
                    elif strip == "b2_statrow":
                        msg = rel_ref[ai] * xblk[bslot, 0]
                    elif strip == "b3_statbuf":
                        msg = rel_ref[ai] * xblk[0, gi]
                    elif strip == "b4_norel":
                        msg = xblk[bslot, gi]
                    else:
                        msg = rel_ref[ai] * xblk[bslot, gi]
                    accs[j] = accs[j] + msg * w
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

        return kernel

    rng = np.random.default_rng(0)
    rel_rows = -(-2 * R // 8) * 8
    relation = jnp.asarray(
        rng.normal(size=(rel_rows, ft, _LANE)).astype(np.float32))
    data = rng.normal(
        size=(lay.padded_gather_rows, F)).astype(np.float32)
    data_blocks = jnp.asarray(
        data.reshape(-1, lay.block_rows, ft, _LANE))
    meta = _pack_meta_packed(lay, lay.gather1, lay.aux)
    w3 = jnp.asarray(
        rng.normal(size=(lay.num_chunks, 1, te)).astype(np.float32))

    tv = lay.tile_rows

    def build_call(strip):
        if strip.startswith("b10"):
            sub = ft // NS
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(lay.num_chunks,),
                in_specs=[
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec((rel_rows, ft, _LANE),
                                 lambda c, cr: (0, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=tuple(
                    pl.BlockSpec((tv, sub, _LANE),
                                 lambda c, cr: (cr[0, c], 0, 0),
                                 memory_space=pltpu.VMEM)
                    for _ in range(NS)
                ),
                scratch_shapes=[
                    pltpu.SMEM((2, 4, te), jnp.int32),
                    pltpu.SMEM((2, 1, te), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,)),
                    pltpu.SemaphoreType.DMA((2,)),
                ] + [pltpu.VMEM((sub, _LANE), jnp.float32)] * NS + [
                    pltpu.VMEM((2, lay.block_rows, ft, _LANE), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
            )
            return pl.pallas_call(
                make_kernel_fsplit(strip),
                grid_spec=grid_spec,
                out_shape=tuple(
                    jax.ShapeDtypeStruct(
                        (lay.padded_rows, sub, _LANE), jnp.float32)
                    for _ in range(NS)
                ),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
                interpret=jax.default_backend() != "tpu",
            )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(lay.num_chunks,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((rel_rows, ft, _LANE), lambda c, cr: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (tv, ft, _LANE), lambda c, cr: (cr[0, c], 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.SMEM((2, 4, te), jnp.int32),
                pltpu.SMEM((2, 1, te), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.VMEM((ft, _LANE), jnp.float32),
                pltpu.VMEM((ft, _LANE), jnp.float32),
                pltpu.VMEM((2, lay.block_rows, ft, _LANE), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        return pl.pallas_call(
            make_kernel(strip),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (lay.padded_rows, ft, _LANE), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=jax.default_backend() != "tpu",
        )

    def slope(make, fargs, lo_n=2, hi_n=6, reps=3):
        lo, hi = make(lo_n), make(hi_n)
        float(lo(*fargs))
        float(hi(*fargs))
        tl = th = float("inf")
        for _ in range(reps):
            t0 = time.time()
            float(lo(*fargs))
            tl = min(tl, time.time() - t0)
            t0 = time.time()
            float(hi(*fargs))
            th = min(th, time.time() - t0)
        return (th - tl) / (hi_n - lo_n)

    results = {
        "workload": {"V": V, "E": E, "slots": slots, "F": F,
                     "te": te, "block_rows": lay.block_rows,
                     "inflation": round(slots / E, 3)},
        "clock_hz": CLOCK_HZ,
        "measured_at": time.strftime("%Y-%m-%d"),
        "method": "slope(chained jit depths, per-depth minima)",
        "variants": {},
    }
    ref_out = {}
    for strip in args.variants.split(","):
        call = build_call(strip)
        if strip == "b0_full" or strip.startswith("b10"):
            # args, not closure constants: closures inline multi-MB arrays
            # as MLIR literals and blow the remote-compile payload limit
            out = jax.jit(lambda md, wd, db, rl, c=call: c(
                lay.cr_pairs, md, wd, db, rl))(
                    meta, w3, data_blocks, relation)
            if strip.startswith("b10"):
                out = jnp.concatenate(list(out), axis=1)
            out = np.asarray(out)
            if "b0" in ref_out:
                err = float(np.max(np.abs(out - ref_out["b0"]))
                            / (np.max(np.abs(ref_out["b0"])) + 1e-9))
                print(f"{strip} vs b0_full rel err: {err:.2e}", flush=True)
                assert err < 1e-5, err
            else:
                ref_out["b0"] = out

        def make(n, call=call):
            @jax.jit
            def f(md, wd, db, rl):
                def body(i, c):
                    db, s = c
                    out = call(lay.cr_pairs, md, wd, db, rl)
                    v = sum(o[0, 0, 0]
                            for o in jax.tree_util.tree_leaves(out))
                    return (db + v * 1e-30, s + v)
                return jax.lax.fori_loop(
                    0, n, body, (db, jnp.float32(0)))[1]
            return f

        t = slope(make, (meta, w3, data_blocks, relation))
        cyc = t * CLOCK_HZ / slots
        results["variants"][strip] = {
            "ms": round(t * 1e3, 2), "cyc_per_slot": round(cyc, 2),
        }
        print(f"{strip:12s} {t*1e3:8.2f} ms  {cyc:6.2f} cyc/slot", flush=True)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
