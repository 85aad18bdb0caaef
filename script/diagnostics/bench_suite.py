"""Secondary perf artifacts (VERDICT r2 #5): every headline claim in
STATUS.md gets a machine-written JSON record in BENCH_SUITE.json at the repo
root, refreshed by running this on the real TPU:

  * rspmm max/min-aggregation kernel fwd+bwd (argext VJP) edges/s
  * dense-MXU relation tower forward (FB-scale 474-node relation graph)
  * full train step (single FB-scale graph, remat auto, batch 64)
  * eval batch (2x all-entity scoring + filtered ranks)

bench.py stays the driver-facing headline (one JSON line, distmult/add).

Usage:  python script/diagnostics/bench_suite.py [--out BENCH_SUITE.json]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)


def slope_time(make_chain, args, lo_n=2, hi_n=6, repeats=3):
    """Per-step time as the SLOPE between two chain depths inside one jit.

    Same methodology as bench.py: the difference cancels the per-dispatch
    constant (15-40 ms of tunnel RTT + sync over the remote-TPU link), which
    would otherwise inflate a ~50 ms leg by ~20%. Slope is computed from the
    per-depth minima across repeats (one noisy-slow lo sample must not
    understate the difference). make_chain(n) must return a jitted callable
    whose scalar float() result forces completion of all n chained steps."""
    lo, hi = make_chain(lo_n), make_chain(hi_n)
    float(lo(*args))  # compile + warm
    float(hi(*args))
    t_lo = t_hi = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        float(lo(*args))
        t_lo = min(t_lo, time.time() - t0)
        t0 = time.time()
        float(hi(*args))
        t_hi = min(t_hi, time.time() - t0)
    return (t_hi - t_lo) / (hi_n - lo_n)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_SUITE.json"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )
    backend = jax.default_backend()
    results = {
        "backend": backend,
        "measured_at": time.strftime("%Y-%m-%d"),
        # every leg is slope-timed (chain-depth difference inside one jit,
        # per-depth minima) — same methodology as bench.py, so these numbers
        # are per-step device time with the tunnel dispatch constant removed
        "method": "slope(chained jit depths, per-depth minima)",
    }

    # ---- kernel: max/min aggregation fwd+bwd (bench.py workload) ----------
    sys.path.insert(0, REPO)
    from bench import build_workload

    from ultra_torchdrug_tpu.data.graph import Graph
    from ultra_torchdrug_tpu.ops.rspmm import generalized_rspmm

    triplets, rel, x = build_workload()
    V, R = 15000, 474
    E = triplets.shape[0]
    impl = "pallas" if backend == "tpu" else "xla"
    g = Graph.from_triplets(triplets, V, R)
    if impl == "pallas":
        g = g.prepare_pallas()

    def kernel_leg(name, agg, compute_dtype="float32"):
        def loss(xx, rr):
            out = generalized_rspmm(
                g.edge_index, g.edge_type, g.edge_weight, rr, xx,
                msg="mul", agg=agg, num_nodes=V, impl=impl, layouts=g.layouts,
                compute_dtype=compute_dtype,
            )
            return jnp.sum(out * out)

        grad_fn = jax.value_and_grad(loss, argnums=(0, 1))

        @jax.jit
        def chain(xx, rr):
            for _ in range(2):
                _, (gx, gr) = grad_fn(xx, rr)
                xx = xx + 1e-12 * gx
                rr = rr + 1e-12 * gr
            return xx, rr

        t = timeit(chain, jnp.asarray(x), jnp.asarray(rel), n=1) / 2
        results[name] = {
            "ms": round(t * 1e3, 2), "edges_per_s": round(E / t, 1),
            "impl": impl, "F": 4096,
        }
        if compute_dtype != "float32":
            results[name]["compute_dtype"] = compute_dtype
        print(f"{name}: {t*1e3:.2f} ms  {E/t/1e6:.2f}M edges/s", flush=True)

    for agg in ("max", "min"):
        kernel_leg(f"rspmm_{agg}_fwd_bwd", agg)
    # opt-in production mode: bf16-streamed gathers/messages, f32 accumulate
    # (fp32 stays the default — reference parity; see CLAUDE.md invariants)
    kernel_leg("rspmm_add_fwd_bwd_bf16", "add", compute_dtype="bfloat16")

    # fused pna pairs: both extrema (or both moments) from ONE kernel pass
    from ultra_torchdrug_tpu.ops.rspmm import (
        generalized_rspmm_addsq, generalized_rspmm_maxmin,
    )

    def pair_leg(name, fn):
        def loss(xx, rr):
            a, b = fn(
                g.edge_index, g.edge_type, g.edge_weight, rr, xx,
                num_nodes=V, impl=impl, layouts=g.layouts,
            )
            return jnp.sum(a * a) + jnp.sum(b * b)

        grad_fn = jax.value_and_grad(loss, argnums=(0, 1))

        @jax.jit
        def chain(xx, rr):
            for _ in range(2):
                _, (gx, gr) = grad_fn(xx, rr)
                xx = xx + 1e-12 * gx
                rr = rr + 1e-12 * gr
            return xx, rr

        t = timeit(chain, jnp.asarray(x), jnp.asarray(rel), n=1) / 2
        results[name] = {
            "ms": round(t * 1e3, 2),
            "eff_edges_per_s": round(2 * E / t, 1),
            "impl": impl, "F": 4096,
        }
        print(f"{name}: {t*1e3:.2f} ms  {2*E/t/1e6:.2f}M eff edges/s",
              flush=True)

    if impl == "pallas":
        pair_leg("rspmm_maxmin_pair_fwd_bwd",
                 lambda *a, **k: generalized_rspmm_maxmin(*a, msg="mul", **k))
        pair_leg("rspmm_addsq_pair_fwd_bwd", generalized_rspmm_addsq)

    # ---- dense-MXU relation tower + full train step + eval batch ----------
    from ultra_torchdrug_tpu.data.datasets import synthetic_transductive
    from ultra_torchdrug_tpu.models.ultra import UltraConfig, _rel_queries
    from ultra_torchdrug_tpu.tasks.task import TaskConfig, TransductiveKGTask

    ds = synthetic_transductive("fb", 14541, 272115, 237, seed=0)
    cfg = UltraConfig.default(ds.num_relations, rspmm_impl=impl)
    cfg = dataclasses.replace(
        cfg,
        entity=dataclasses.replace(cfg.entity, remat=True),
        relation=dataclasses.replace(cfg.relation, remat=True),
    )
    task = TransductiveKGTask(ds, cfg, TaskConfig(num_negative=128))
    params = task.init_params(jax.random.PRNGKey(0))
    B = 64
    batch = jnp.asarray(task.train_triples[:B])
    key = jax.random.PRNGKey(1)

    _, relg_p = task._prepare_graphs(task.fact_graph, task.rel_graph)
    rel_fwd = jax.jit(lambda p: _rel_queries(p, cfg, relg_p, batch[:, 2]))
    t = timeit(rel_fwd, params)
    results["rel_tower_fwd_dense_mxu"] = {
        "ms": round(t * 1e3, 2), "rel_nodes": int(relg_p.num_nodes),
        "layers": 6,
    }
    print(f"rel tower fwd: {t*1e3:.2f} ms", flush=True)

    step = jax.jit(jax.value_and_grad(
        lambda p: task._loss_fn(p, key, batch, None)[0]))
    t = timeit(step, params, n=2)
    results["train_step_fwd_bwd_fb"] = {
        "ms": round(t * 1e3, 1), "B": B, "V": int(ds.num_entities),
        "E_und": int(2 * task.fact_graph.num_edges), "remat": "full",
    }
    print(f"train fwd+bwd: {t*1e3:.1f} ms", flush=True)

    cfg_s = dataclasses.replace(
        cfg,
        entity=dataclasses.replace(cfg.entity, remat="save_rspmm"),
        relation=dataclasses.replace(cfg.relation, remat="save_rspmm"),
    )
    task_s = TransductiveKGTask(ds, cfg_s, TaskConfig(num_negative=128))
    step_s = jax.jit(jax.value_and_grad(
        lambda p: task_s._loss_fn(p, key, batch, None)[0]))
    t = timeit(step_s, params, n=2)
    results["train_step_fwd_bwd_fb_save_rspmm"] = {
        "ms": round(t * 1e3, 1), "B": B, "V": int(ds.num_entities),
        "E_und": int(2 * task.fact_graph.num_edges), "remat": "save_rspmm",
    }
    print(f"train fwd+bwd (save_rspmm): {t*1e3:.1f} ms", flush=True)

    # the shipped default: remat='auto' resolves fastest-fits-first per
    # graph/batch (full-save + unrolled stack at FB scale on a 16 GB chip)
    cfg_a = dataclasses.replace(
        cfg,
        entity=dataclasses.replace(cfg.entity, remat="auto"),
        relation=dataclasses.replace(cfg.relation, remat="auto"),
    )
    task_a = TransductiveKGTask(ds, cfg_a, TaskConfig(num_negative=128))
    step_a = jax.jit(jax.value_and_grad(
        lambda p: task_a._loss_fn(p, key, batch, None)[0]))
    t = timeit(step_a, params, n=2)
    results["train_step_fwd_bwd_fb_auto"] = {
        "ms": round(t * 1e3, 1), "B": B, "V": int(ds.num_entities),
        "E_und": int(2 * task.fact_graph.num_edges), "remat": "auto",
    }
    print(f"train fwd+bwd (auto, shipped default): {t*1e3:.1f} ms", flush=True)

    ev = task._eval_fn
    ebatch = jnp.asarray(task.eval_triples("valid")[:16])
    t = timeit(lambda p: ev(p, ebatch), params, n=2)
    results["eval_batch16"] = {
        "ms": round(t * 1e3, 1),
        "triples_per_s": round(16 / t, 1),
    }
    print(f"eval batch-16: {t*1e3:.1f} ms", flush=True)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
