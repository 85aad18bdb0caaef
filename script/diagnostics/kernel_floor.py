"""Decompose the per-edge serial floor of the rspmm gather kernels.

Runs a ladder of stripped-down kernel variants on a synthetic VMEM-resident
workload (the fwd_hot shape: every gather hits VMEM, no per-edge DMAs) and
reports cycles/edge for each, so the cost of each per-edge ingredient —
flush branch, scalar SMEM loads, dynamic row addressing, the serial FMA
chain — can be read off as deltas:

  v4_pure_fma    acc += const_row * w          (fma chain + scalar w only)
  v3_multiacc    4 independent telescoping accumulators, unroll 4
  v2_noscalar    acc += rel[r] * x[s]          (no w load; dyn addressing)
  v1_nobranch    acc += rel[r] * x[s] * w      (no flush branch; wrong out)
  v0_current     the shipped telescoping add path

All variants share the same SMEM metadata pipeline as the real kernel.
Perf-only: v1-v4 do not produce correct outputs.

Usage: python script/diagnostics/kernel_floor.py [--edges 524288] [--runlen 32]
"""

import argparse
import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128


def make_kernel(variant: str, num_chunks: int):
    def kernel(cr_ref, meta_hbm, w_hbm, data_ref, rel_ref, out_ref,
               mbuf, wbuf, msems, wsems, mark_ref):
        c = pl.program_id(0)
        slot = jax.lax.rem(c, 2)
        nxt = jax.lax.rem(c + 1, 2)

        @pl.when(cr_ref[0, c] != cr_ref[1, c])
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        @pl.when(c == 0)
        def _():
            pltpu.make_async_copy(meta_hbm.at[0], mbuf.at[0], msems.at[0]).start()
            pltpu.make_async_copy(w_hbm.at[0], wbuf.at[0], wsems.at[0]).start()

        pltpu.make_async_copy(meta_hbm.at[c], mbuf.at[slot], msems.at[slot]).wait()
        pltpu.make_async_copy(w_hbm.at[c], wbuf.at[slot], wsems.at[slot]).wait()

        @pl.when(c + 1 < num_chunks)
        def _():
            pltpu.make_async_copy(meta_hbm.at[c + 1], mbuf.at[nxt], msems.at[nxt]).start()
            pltpu.make_async_copy(w_hbm.at[c + 1], wbuf.at[nxt], wsems.at[nxt]).start()

        te = mbuf.shape[-1]
        mark_ref[...] = jnp.zeros_like(mark_ref)

        if variant == "v4_pure_fma":
            const_row = data_ref[0]

            def body(i, acc):
                w = wbuf[slot, 0, i]
                return acc + const_row * w

            acc = jax.lax.fori_loop(0, te, body, jnp.zeros(out_ref.shape[1:], jnp.float32))
            out_ref[pl.ds(0, 1)] = out_ref[pl.ds(0, 1)] + acc[None]
            return

        if variant == "v1_nobranch":
            def body(i, acc):
                xrow = data_ref[mbuf[slot, 0, i]]
                w = wbuf[slot, 0, i]
                msg = rel_ref[mbuf[slot, 1, i]] * xrow
                return acc + msg * w

            acc = jax.lax.fori_loop(0, te, body, jnp.zeros(out_ref.shape[1:], jnp.float32))
            out_ref[pl.ds(0, 1)] = out_ref[pl.ds(0, 1)] + acc[None]
            return

        if variant == "v2_noscalar":
            def body(i, carry):
                d_prev, acc = carry
                xrow = data_ref[mbuf[slot, 0, i]]
                d = mbuf[slot, 2, i]
                flush = d != d_prev

                @pl.when(flush)
                def _():
                    out_ref[pl.ds(d_prev, 1)] = (
                        out_ref[pl.ds(d_prev, 1)] + (acc - mark_ref[...])[None]
                    )
                    mark_ref[...] = acc

                msg = rel_ref[mbuf[slot, 1, i]] * xrow
                return d, acc + msg

            d_last, acc = jax.lax.fori_loop(
                0, te, body, (0, jnp.zeros(out_ref.shape[1:], jnp.float32)))
            out_ref[pl.ds(d_last, 1)] = (
                out_ref[pl.ds(d_last, 1)] + (acc - mark_ref[...])[None])
            return

        if variant.startswith("v3_multiacc"):
            UN = int(variant.rsplit("acc", 1)[1] or 4)

            def body(q, carry):
                d_prev, *accs = carry
                accs = list(accs)
                for j in range(UN):
                    i = q * UN + j
                    xrow = data_ref[mbuf[slot, 0, i]]
                    w = wbuf[slot, 0, i]
                    d = mbuf[slot, 2, i]
                    flush = d != d_prev

                    @pl.when(flush)
                    def _(d_prev=d_prev, accs=tuple(accs)):
                        total = accs[0]
                        for k in range(1, UN):
                            total = total + accs[k]
                        out_ref[pl.ds(d_prev, 1)] = (
                            out_ref[pl.ds(d_prev, 1)]
                            + (total - mark_ref[...])[None]
                        )
                        mark_ref[...] = total

                    msg = rel_ref[mbuf[slot, 1, i]] * xrow
                    accs[j] = accs[j] + msg * w
                    d_prev = d
                return (d_prev, *accs)

            z = jnp.zeros(out_ref.shape[1:], jnp.float32)
            d_last, *accs = jax.lax.fori_loop(
                0, te // UN, body, (0,) + (z,) * UN)
            total = accs[0]
            for k in range(1, UN):
                total = total + accs[k]
            out_ref[pl.ds(d_last, 1)] = (
                out_ref[pl.ds(d_last, 1)] + (total - mark_ref[...])[None])
            return

        if variant.startswith("v5_drrmw"):
            # v3_multiacc4 plus a per-edge dynamic read-modify-write into a
            # second VMEM region (emulating the fused backward's dr[r] +=),
            # quantifying the argmax-free dr scatter cost. Reuses out_ref
            # rows [0, R') as the dr surrogate via the rel index.
            UN = 4

            def body(q, carry):
                d_prev, *accs = carry
                accs = list(accs)
                for j in range(UN):
                    i = q * UN + j
                    xrow = data_ref[mbuf[slot, 0, i]]
                    w = wbuf[slot, 0, i]
                    d = mbuf[slot, 2, i]
                    r = mbuf[slot, 1, i]
                    flush = d != d_prev

                    @pl.when(flush)
                    def _(d_prev=d_prev, accs=tuple(accs)):
                        total = accs[0]
                        for k in range(1, UN):
                            total = total + accs[k]
                        out_ref[pl.ds(d_prev, 1)] = (
                            out_ref[pl.ds(d_prev, 1)]
                            + (total - mark_ref[...])[None]
                        )
                        mark_ref[...] = total

                    msg = rel_ref[r] * xrow
                    accs[j] = accs[j] + msg * w
                    # dr-style scatter: dynamic RMW keyed by rel (r < tv here)
                    out_ref[pl.ds(jax.lax.rem(r, 64), 1)] = (
                        out_ref[pl.ds(jax.lax.rem(r, 64), 1)] + (msg * w)[None]
                    )
                    d_prev = d
                return (d_prev, *accs)

            z = jnp.zeros(out_ref.shape[1:], jnp.float32)
            d_last, *accs = jax.lax.fori_loop(
                0, te // UN, body, (0,) + (z,) * UN)
            total = accs[0]
            for k in range(1, UN):
                total = total + accs[k]
            out_ref[pl.ds(d_last, 1)] = (
                out_ref[pl.ds(d_last, 1)] + (total - mark_ref[...])[None])
            return

        if variant.startswith("v6_packed"):
            # multiacc with PACKED metadata: one SMEM load per edge decoded
            # with shifts/masks (idx<<18 | rel<<8 | row_local) instead of
            # three separate SMEM loads — measures the scalar-load share of
            # the per-edge floor. Packing fits whenever
            # bits(idx)+bits(rel)+8 <= 31 (true for FB-scale workloads).
            UN = int(variant.rsplit("packed", 1)[1] or 8)

            def body(q, carry):
                d_prev, *accs = carry
                accs = list(accs)
                for j in range(UN):
                    i = q * UN + j
                    m = mbuf[slot, 0, i]
                    xrow = data_ref[m >> 18]
                    w = wbuf[slot, 0, i]
                    d = m & 255
                    flush = d != d_prev

                    @pl.when(flush)
                    def _(d_prev=d_prev, accs=tuple(accs)):
                        total = accs[0]
                        for k in range(1, UN):
                            total = total + accs[k]
                        out_ref[pl.ds(d_prev, 1)] = (
                            out_ref[pl.ds(d_prev, 1)]
                            + (total - mark_ref[...])[None]
                        )
                        mark_ref[...] = total

                    msg = rel_ref[(m >> 8) & 1023] * xrow
                    accs[j] = accs[j] + msg * w
                    d_prev = d
                return (d_prev, *accs)

            z = jnp.zeros(out_ref.shape[1:], jnp.float32)
            d_last, *accs = jax.lax.fori_loop(
                0, te // UN, body, (0,) + (z,) * UN)
            total = accs[0]
            for k in range(1, UN):
                total = total + accs[k]
            out_ref[pl.ds(d_last, 1)] = (
                out_ref[pl.ds(d_last, 1)] + (total - mark_ref[...])[None])
            return

        if variant == "v7_direct":
            # branch-free per-edge dynamic RMW into the out tile: no flush
            # branch, no telescoping, no accumulator rotation. Mosaic
            # serializes same-ref RMW correctly (the shipped fused backward's
            # dr scatter is hardware-parity-tested); v5 measured that
            # serialization at ~3 cyc/edge, so at short run lengths this
            # should beat the flush machinery (~6 cyc/edge at runlen 2).
            def body(i, z):
                xrow = data_ref[mbuf[slot, 0, i]]
                w = wbuf[slot, 0, i]
                d = mbuf[slot, 2, i]
                msg = rel_ref[mbuf[slot, 1, i]] * xrow
                out_ref[pl.ds(d, 1)] = out_ref[pl.ds(d, 1)] + (msg * w)[None]
                return z

            jax.lax.fori_loop(0, te, body, 0)
            return

        if variant == "v8_direct_packed":
            # v7 + packed metadata: one SMEM load per edge, 20/10-bit split
            # (idx << 20 | rel << 10 | row_local) for tv up to 1024.
            def body(i, z):
                m = mbuf[slot, 0, i]
                xrow = data_ref[m >> 20]
                w = wbuf[slot, 0, i]
                d = m & 1023
                msg = rel_ref[(m >> 10) & 1023] * xrow
                out_ref[pl.ds(d, 1)] = out_ref[pl.ds(d, 1)] + (msg * w)[None]
                return z

            jax.lax.fori_loop(0, te, body, 0)
            return

        # v0_current: the shipped telescoping add path
        def body(i, carry):
            d_prev, acc = carry
            xrow = data_ref[mbuf[slot, 0, i]]
            w = wbuf[slot, 0, i]
            d = mbuf[slot, 2, i]
            flush = d != d_prev

            @pl.when(flush)
            def _():
                out_ref[pl.ds(d_prev, 1)] = (
                    out_ref[pl.ds(d_prev, 1)] + (acc - mark_ref[...])[None]
                )
                mark_ref[...] = acc

            msg = rel_ref[mbuf[slot, 1, i]] * xrow
            return d, acc + msg * w

        d_last, acc = jax.lax.fori_loop(
            0, te, body, (0, jnp.zeros(out_ref.shape[1:], jnp.float32)))
        out_ref[pl.ds(d_last, 1)] = (
            out_ref[pl.ds(d_last, 1)] + (acc - mark_ref[...])[None])

    return kernel


def run_variant(variant, E, runlen, F=4096, V=4096, R=480, te=8192, tv=256,
                chain=8):
    ft = F // _LANE
    C = E // te
    rng = np.random.default_rng(0)
    # row-sorted destinations with the requested mean run length, confined to
    # one tv block per chunk (cr block index = chunk * tv rows / tv)
    meta = np.zeros((C, 4, te), np.int32)
    cr = np.zeros((2, C), np.int32)
    rows_per_chunk = te // runlen
    for c in range(C):
        d = np.repeat(np.arange(rows_per_chunk) % tv, runlen)
        meta[c, 0] = rng.integers(0, V, te)     # gather index
        meta[c, 1] = rng.integers(0, R, te)     # relation
        meta[c, 2] = np.sort(d)[:te]            # row_local
        meta[c, 3] = 1
        if variant.startswith("v6_packed"):
            assert V <= (1 << 13) and R <= (1 << 10) and tv <= 256
            meta[c, 0] = (meta[c, 0] << 18) | (meta[c, 1] << 8) | meta[c, 2]
        if variant == "v8_direct_packed":
            assert V <= (1 << 11) and R <= (1 << 10) and tv <= 1024
            meta[c, 0] = (meta[c, 0] << 20) | (meta[c, 1] << 10) | meta[c, 2]
        cr[0, c] = 0
        cr[1, c] = 0
    cr[1, 0] = 1  # force out-block init on the first chunk
    w = rng.normal(size=(C, 1, te)).astype(np.float32)
    data = rng.normal(size=(V, ft, _LANE)).astype(np.float32)
    rel = rng.normal(size=(R, ft, _LANE)).astype(np.float32)

    kernel = make_kernel(variant, C)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(C,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((V, ft, _LANE), lambda c, cr: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, ft, _LANE), lambda c, cr: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tv, ft, _LANE), lambda c, cr: (cr[0, c], 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SMEM((2, 4, te), jnp.int32),
            pltpu.SMEM((2, 1, te), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((ft, _LANE), jnp.float32),
        ],
    )
    call = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((tv, ft, _LANE), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )

    def make_chained(n):
        @jax.jit
        def chained(cr_, meta_, w_, data_, rel_):
            out = jnp.zeros((tv, ft, _LANE), jnp.float32)
            for _ in range(n):
                out = out + call(cr_, meta_, w_, data_ + out[0, 0, 0], rel_)
            return out[0, 0, 0]  # scalar result: float() forces completion

        return chained

    lo, hi = make_chained(2), make_chained(2 + chain)
    meta_d, data_d, rel_d = (jnp.asarray(meta), jnp.asarray(data),
                             jnp.asarray(rel))
    cr_d, w_d = jnp.asarray(cr), jnp.asarray(w)
    float(lo(cr_d, meta_d, w_d, data_d, rel_d))  # compile
    float(hi(cr_d, meta_d, w_d, data_d, rel_d))
    # slope timing: (t[chain+2 calls] - t[2 calls]) / chain cancels the
    # dispatch/fetch constant (remote tunnel RTT is tens of ms)
    best = float("inf")
    for rep in range(3):
        t0 = time.time()
        float(lo(cr_d, meta_d, w_d, data_d, rel_d))
        t_lo = time.time() - t0
        t0 = time.time()
        float(hi(cr_d, meta_d, w_d, data_d, rel_d))
        t_hi = time.time() - t0
        best = min(best, (t_hi - t_lo) / chain)
    per_call = best
    cyc = per_call * 940e6 / E  # v5e ~940 MHz
    return per_call * 1e3, cyc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=524288)
    ap.add_argument("--runlen", type=int, default=32)
    ap.add_argument("--variants", type=str, default="v0_current,v1_nobranch,"
                    "v2_noscalar,v3_multiacc4,v4_pure_fma")
    ap.add_argument("--te", type=int, default=8192)
    ap.add_argument("--tv", type=int, default=256)
    ap.add_argument("--vrows", type=int, default=4096)
    args = ap.parse_args()
    for v in args.variants.split(","):
        ms, cyc = run_variant(v, args.edges, args.runlen, te=args.te,
                              tv=args.tv, V=args.vrows)
        print(f"{v:14s} {ms:8.2f} ms  {cyc:6.1f} cyc/edge", flush=True)


if __name__ == "__main__":
    main()
