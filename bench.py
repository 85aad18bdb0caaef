"""Headline benchmark: rspmm fwd+bwd edges/s per chip (BASELINE.json metric).

Runs the fused Pallas relational-SpMM (distmult message, sum aggregation — the
configuration every shipped ULTRA config uses) on an FB15k237-pretrain-scale
synthetic workload: V=15k entities, E=544k undirected edges, feature width
B*D = 64*64 = 4096 (batch 64 of 64-dim states, the pretrain_3g setting).

One forward + backward (3 rspmm-shaped reductions) counts as one edge-visit
unit, matching how the reference's CUDA kernel is exercised per training step.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": "edges/s", "vs_baseline": ...}
vs_baseline = speedup over the XLA segment-op implementation of the same op on
the same chip (the no-custom-kernel baseline, i.e. what torch_scatter-style
scatter ops give you).
"""

import json
import sys
import time

import numpy as np


def build_workload(V=15000, E=544 * 1024, R=474, B=64, D=64, seed=0):
    """Heavy-tailed endpoint distribution (Zipf-like), matching real KG degree
    statistics (FB15k237 etc. are strongly hub-dominated — a uniform-random
    graph would misrepresent both cache behavior and kernel scheduling)."""
    rng = np.random.default_rng(seed)

    def zipf_nodes(n):
        # 50/50 uniform + zipf(1.5): top-1024 sources cover ~53% of edges,
        # in line with FB15k237-like hub dominance
        n_u = n // 2
        uniform = rng.integers(0, V, n_u)
        ranks = rng.zipf(1.5, size=3 * n)
        ranks = ranks[ranks <= V][: n - n_u] - 1
        perm = rng.permutation(V)  # decouple id order from hotness
        out = np.concatenate([uniform, perm[ranks]])
        return rng.permutation(out).astype(np.int32)

    triplets = np.stack(
        [zipf_nodes(E), zipf_nodes(E), rng.integers(0, R, E)], axis=1
    ).astype(np.int32)
    rel = rng.normal(size=(R, D)).astype(np.float32) * 0.1
    x = rng.normal(size=(V, B, D)).astype(np.float32) * 0.1
    return triplets, rel, x


def bench_impl(impl, triplets, rel, x, V, R, chain=4, repeats=3, batch_chunk=None):
    """batch_chunk: evaluate on a B-slice and scale the time as if the full
    batch ran in B/batch_chunk sequential passes — the XLA segment-op baseline
    materializes [E, B, D] messages (18+ GB at the full workload) and cannot
    run unchunked on a 16 GB chip; chunking is what a non-fused implementation
    must actually do.

    Timing is the SLOPE between two chain depths (2 and 2+chain steps inside
    one jit): the difference cancels the per-dispatch constant — over the
    remote-TPU tunnel that constant is 15-40 ms of RTT plus sync, which would
    otherwise inflate a ~35 ms step by ~20%. Each chained step consumes the
    previous step's gradients, so no step can be elided or overlapped."""
    import jax
    import jax.numpy as jnp

    from ultra_torchdrug_tpu.data.graph import Graph
    from ultra_torchdrug_tpu.ops.rspmm import generalized_rspmm

    scale = 1.0
    if batch_chunk is not None and batch_chunk < x.shape[1]:
        scale = x.shape[1] / batch_chunk
        x = x[:, :batch_chunk]
    g = Graph.from_triplets(triplets, V, R)
    layouts = None
    if impl == "pallas":
        g = g.prepare_pallas()
        layouts = g.layouts
    ei, et, w = g.edge_index, g.edge_type, g.edge_weight
    relation = jnp.asarray(rel)
    x0 = jnp.asarray(x)

    def loss(xx, relation):
        out = generalized_rspmm(
            ei, et, w, relation, xx, msg="mul", agg="add",
            num_nodes=V, impl=impl, layouts=layouts,
        )
        return jnp.sum(out * out), out

    grad_fn = jax.value_and_grad(lambda xx, rr: loss(xx, rr)[0], argnums=(0, 1))

    def make_chain(n):
        @jax.jit
        def chain_fn(xx, relation):
            for _ in range(n):
                (l, (gx, gr)) = grad_fn(xx, relation)
                xx = xx + 1e-12 * gx
                relation = relation + 1e-12 * gr
            # scalar result: float() forces completion of the whole chain
            # (block_until_ready is unreliable over the tunnel)
            return xx[0, 0, 0] + relation.ravel()[0]
        return chain_fn

    lo, hi = make_chain(2), make_chain(2 + chain)
    float(lo(x0, relation))  # compile + warm
    float(hi(x0, relation))
    # slope from the per-depth minima across repeats: pairing independent
    # single timings would let one noisy-slow t_lo sample understate (or even
    # negate) the difference and bias the reported throughput high
    t_lo_best = t_hi_best = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        float(lo(x0, relation))
        t_lo_best = min(t_lo_best, time.time() - t0)
        t0 = time.time()
        float(hi(x0, relation))
        t_hi_best = min(t_hi_best, time.time() - t0)
    per_step = (t_hi_best - t_lo_best) / chain * scale  # one full-batch fwd+bwd
    E = triplets.shape[0]
    slots = None
    if impl == "pallas" and layouts is not None and layouts.fwd_blk is not None:
        slots = (int(np.prod(layouts.fwd_blk.valid.shape)),
                 int(np.prod(layouts.rev_blk.valid.shape)))
    return E / per_step, per_step, slots


def roofline_edges_per_s(E, slots_fwd, slots_bwd, clock_hz=940e6):
    """Operative roofline from KERNEL_ROOFLINE.md §2 (measured, not vibes):
    per-slot cycles = the measured per-edge body floor (11.7, blocked_ladder
    b1_noflush on the real layout) + the cheapest single-ingredient output
    commit measured (4.8); the backward adds the per-edge dr scatter + src
    row refresh (4.1, kernel_floor v5). Classical VPU/HBM bounds are 2-3x
    lower than any measured body and the flush cost survived three redesigns
    — this floor is the defensible denominator for the >=70% gate."""
    fwd_cyc = slots_fwd * (11.7 + 4.8)
    bwd_cyc = slots_bwd * (11.7 + 4.8 + 4.1)
    return E / ((fwd_cyc + bwd_cyc) / clock_hz)


_BASELINE_CACHE = "BASELINE_LOCAL.json"  # committed XLA-baseline measurement


def _load_baseline_cache(backend):
    import os

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        _BASELINE_CACHE)
    try:
        with open(path) as f:
            data = json.load(f)
        return data.get(backend)
    except Exception:
        return None


def _store_baseline_cache(backend, edges_per_s, per_step):
    import os

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        _BASELINE_CACHE)
    try:
        with open(path) as f:
            data = json.load(f)
    except Exception:
        data = {}
    data[backend] = {"edges_per_s": edges_per_s, "per_step": per_step,
                     "measured_at": time.strftime("%Y-%m-%d")}
    with open(path, "w") as f:
        json.dump(data, f, indent=1)


def main():
    import jax
    import os as _os

    try:  # persistent XLA/Mosaic compile cache (compiles are minutes here)
        import jax as _jax

        _cache = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                               ".jax_cache")
        _jax.config.update("jax_compilation_cache_dir", _cache)
    except Exception:
        pass

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    triplets, rel, x = build_workload()
    V, R = 15000, 474
    E = triplets.shape[0]

    # headline FIRST: the Pallas measurement prints its JSON line before any
    # baseline re-measurement can eat the caller's time budget (round 1's
    # bench timed out re-measuring the chained-XLA baseline uncached)
    impl = "pallas" if on_tpu else "xla"
    edges_per_s, per_step, slots = bench_impl(impl, triplets, rel, x, V, R)
    roofline = (roofline_edges_per_s(E, *slots) if slots else None)

    cached = _load_baseline_cache(backend)
    refresh = "--refresh-baseline" in sys.argv or cached is None
    if refresh and on_tpu and cached is not None:
        # a stored measurement exists: print the headline now, refresh after
        pass
    base_edges_per_s = cached["edges_per_s"] if cached else None
    base_step = cached["per_step"] if cached else None

    def emit(base_eps):
        result = {
            "metric": f"rspmm_fwd_bwd_edges_per_s_{impl}_{backend}",
            "value": round(edges_per_s, 1),
            "unit": "edges/s",
            "vs_baseline": round(edges_per_s / base_eps, 3) if base_eps else None,
        }
        if roofline:
            # achieved / operative roofline (KERNEL_ROOFLINE.md §2)
            result["vs_roofline"] = round(edges_per_s / roofline, 3)
        print(json.dumps(result), flush=True)

    if cached:
        emit(base_edges_per_s)
    if refresh:
        # baseline: XLA segment-op implementation of the same op (what
        # torch_scatter-style segment ops give you), B-chunked to fit HBM
        base_edges_per_s, base_step, _ = bench_impl(
            "xla", triplets, rel, x, V, R, chain=2, repeats=2, batch_chunk=16
        )
        _store_baseline_cache(backend, base_edges_per_s, base_step)
        if not cached:
            emit(base_edges_per_s)
        else:
            print(f"# refreshed baseline: {base_edges_per_s:.0f} edges/s",
                  file=sys.stderr)
    print(
        f"# impl={impl} backend={backend} E={E} F=4096 "
        f"fwd+bwd={per_step*1e3:.2f}ms (xla baseline "
        f"{(base_step or 0)*1e3:.2f}ms); "
        f"HBM gather-bound estimate {3*E*4096*4/819e9*1e3:.1f}ms",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
