"""Feature-width sweep of the headline rspmm kernel (VERDICT r2 weak #5:
the bench covered one point, F=4096). F = B*D with D=64, so this is the
batch-size axis of the shipped configs (B = F/64). Writes BENCH_FSWEEP.json
at the repo root; slope-timed like bench.py.

Usage: python script/diagnostics/f_sweep.py [--widths 1024,2048,4096]
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--widths", default="1024,2048,4096")
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_FSWEEP.json"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )
    from bench import build_workload

    from ultra_torchdrug_tpu.data.graph import Graph
    from ultra_torchdrug_tpu.ops.rspmm import generalized_rspmm

    backend = jax.default_backend()
    impl = "pallas" if backend == "tpu" else "xla"
    V, R, D = 15000, 474, 64
    results = {"backend": backend, "impl": impl,
               "measured_at": time.strftime("%Y-%m-%d"), "widths": {}}

    for F in [int(w) for w in args.widths.split(",")]:
        B = F // D
        triplets, rel, x = build_workload(V=V, R=R, B=B, D=D)
        E = triplets.shape[0]
        g = Graph.from_triplets(triplets, V, R)
        if impl == "pallas":
            g = g.prepare_pallas()

        def loss(xx, rr):
            out = generalized_rspmm(
                g.edge_index, g.edge_type, g.edge_weight, rr, xx,
                msg="mul", agg="add", num_nodes=V, impl=impl,
                layouts=g.layouts,
            )
            return jnp.sum(out * jnp.sin(out))

        grad_fn = jax.value_and_grad(loss, argnums=(0, 1))

        def make_chain(n):
            @jax.jit
            def chain(xx, rr):
                for _ in range(n):
                    _, (gx, gr) = grad_fn(xx, rr)
                    xx = xx + 1e-12 * gx
                    rr = rr + 1e-12 * gr
                return xx[0, 0, 0] + rr.ravel()[0]
            return chain

        x0, r0 = jnp.asarray(x), jnp.asarray(rel)
        lo, hi = make_chain(2), make_chain(6)
        float(lo(x0, r0))
        float(hi(x0, r0))
        best = float("inf")
        for _ in range(3):
            t0 = time.time(); float(lo(x0, r0)); tl = time.time() - t0
            t0 = time.time(); float(hi(x0, r0)); th = time.time() - t0
            best = min(best, (th - tl) / 4)
        blocked = bool(impl == "pallas" and g.layouts.fwd_blk is not None)
        results["widths"][str(F)] = {
            "B": B, "fwd_bwd_ms": round(best * 1e3, 2),
            "edges_per_s": round(E / best, 1), "blocked": blocked,
        }
        print(f"F={F} (B={B}): {best*1e3:.2f} ms  {E/best/1e6:.2f}M edges/s "
              f"blocked={blocked}", flush=True)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
