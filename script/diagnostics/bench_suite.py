"""Secondary perf artifacts (VERDICT r2 #5): every headline claim in
STATUS.md gets a machine-written JSON record in BENCH_SUITE.json at the repo
root, refreshed by running this on the real TPU:

  * rspmm max/min-aggregation kernel fwd+bwd (argext VJP) edges/s
  * fused pna pair kernels (maxmin, addsq) fwd+bwd
  * bf16-streamed add kernel fwd+bwd (opt-in production mode)
  * dense-MXU relation tower forward (FB-scale 474-node relation graph)
  * full train step (single FB-scale graph; full remat / save_rspmm / the
    shipped remat='auto' default), batch 64
  * eval batch (2x all-entity scoring + filtered ranks)

Every leg is slope-timed: per-step time is the SLOPE between two chain
depths run inside one jit (lax.fori_loop whose carry feeds each step's
output into the next step's input, so no step can be elided or overlapped),
with the slope computed from per-depth minima across repeats. This is the
same methodology as bench.py — it cancels the per-dispatch constant, which
over the remote-TPU tunnel is 15-40 ms of RTT + sync and would otherwise
inflate a ~50 ms leg by ~20%.

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

    make_chain(n) must return a jitted callable over *args whose scalar
    float() result forces completion of all n chained steps (float() is the
    reliable completion barrier over the tunnel; block_until_ready is not
    for small outputs). Slope is computed from the per-depth minima across
    repeats — pairing independent single timings would let one noisy-slow
    lo sample understate (or negate) the difference."""
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
        # see module docstring: every leg chains steps with a data-dependent
        # carry inside one jit and reports the per-depth-minima slope
        "method": "slope(chained jit depths, per-depth minima)",
    }

    def tree_bump(p, s):
        # fold a scalar into every leaf: forces each chained step to depend
        # on the previous step's full output (1e-30 leaves values unchanged
        # at f32 precision but is not statically zero, so XLA cannot elide)
        return jax.tree_util.tree_map(lambda a: a + (s * 1e-30).astype(a.dtype), p)

    def first_scalar(p):
        return jax.tree_util.tree_leaves(p)[0].ravel()[0].astype(jnp.float32)

    # ---- kernel: max/min aggregation fwd+bwd (bench.py workload) ----------
    from bench import build_workload

    from ultra_torchdrug_tpu.data.graph import Graph
    from ultra_torchdrug_tpu.ops.rspmm import generalized_rspmm

    triplets, rel, x = build_workload()
    V, R = 15000, 474
    E = triplets.shape[0]
    impl = "pallas" if backend == "tpu" else "xla"
    g = Graph.from_triplets(triplets, V, R)
    g_mm = g_pair = g
    if impl == "pallas":
        # three layout families, matching the task layer's aggregate-driven
        # choice (tasks/task.py::_prepare_graphs): contiguous for add,
        # interleaved for extrema, interleaved + 256-row bwd blocks for the
        # pna pair kernels
        g_mm = g.prepare_pallas(interleave=8)
        g_pair = g.prepare_pallas(interleave=8, bwd_block_rows=256)
        g = g.prepare_pallas()
    x0, rel0 = jnp.asarray(x), jnp.asarray(rel)

    def grad_chain(grad_fn):
        """make_chain for a (xx, rr) -> (loss, (gx, gr)) grad function."""
        def make_chain(n):
            @jax.jit
            def chain(xx, rr):
                def body(i, carry):
                    xx, rr = carry
                    _, (gx, gr) = grad_fn(xx, rr)
                    return (xx + 1e-12 * gx, rr + 1e-12 * gr)
                xx, rr = jax.lax.fori_loop(0, n, body, (xx, rr))
                return xx[0, 0, 0] + rr.ravel()[0]
            return chain
        return make_chain

    def kernel_leg(name, agg, compute_dtype="float32", graph=None):
        graph = graph if graph is not None else g

        def loss(xx, rr):
            out = generalized_rspmm(
                graph.edge_index, graph.edge_type, graph.edge_weight, rr, xx,
                msg="mul", agg=agg, num_nodes=V, impl=impl,
                layouts=graph.layouts, compute_dtype=compute_dtype,
            )
            return jnp.sum(out * out)

        grad_fn = jax.value_and_grad(loss, argnums=(0, 1))
        t = slope_time(grad_chain(grad_fn), (x0, rel0))
        results[name] = {
            "ms": round(t * 1e3, 2), "edges_per_s": round(E / t, 1),
            "impl": impl, "F": 4096,
        }
        if compute_dtype != "float32":
            results[name]["compute_dtype"] = compute_dtype
        print(f"{name}: {t*1e3:.2f} ms  {E/t/1e6:.2f}M edges/s", flush=True)

    for agg in ("max", "min"):
        kernel_leg(f"rspmm_{agg}_fwd_bwd", agg, graph=g_mm)
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
                g_pair.edge_index, g_pair.edge_type, g_pair.edge_weight,
                rr, xx, num_nodes=V, impl=impl, layouts=g_pair.layouts,
            )
            return jnp.sum(a * a) + jnp.sum(b * b)

        grad_fn = jax.value_and_grad(loss, argnums=(0, 1))
        t = slope_time(grad_chain(grad_fn), (x0, rel0))
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

    def make_rel_chain(n):
        @jax.jit
        def chain(p):
            def body(i, p):
                q = _rel_queries(p, cfg, relg_p, batch[:, 2])
                return tree_bump(p, jnp.sum(q))
            return first_scalar(jax.lax.fori_loop(0, n, body, p))
        return chain

    t = slope_time(make_rel_chain, (params,), lo_n=2, hi_n=10)
    results["rel_tower_fwd_dense_mxu"] = {
        "ms": round(t * 1e3, 2), "rel_nodes": int(relg_p.num_nodes),
        "layers": 6,
    }
    print(f"rel tower fwd: {t*1e3:.2f} ms", flush=True)

    def step_chain(task_obj):
        vg = jax.value_and_grad(
            lambda p: task_obj._loss_fn(p, key, batch, None)[0])

        def make_chain(n):
            @jax.jit
            def chain(p):
                def body(i, carry):
                    p, acc = carry
                    loss, grads = vg(p)
                    p = jax.tree_util.tree_map(
                        lambda a, ga: a + 1e-12 * ga, p, grads)
                    return (p, acc + loss)
                p, acc = jax.lax.fori_loop(
                    0, n, body, (p, jnp.float32(0.0)))
                return acc + first_scalar(p)
            return chain
        return make_chain

    def train_leg(name, task_obj, remat_label):
        t = slope_time(step_chain(task_obj), (params,), lo_n=1, hi_n=3)
        results[name] = {
            "ms": round(t * 1e3, 1), "B": B, "V": int(ds.num_entities),
            "E_und": int(2 * task.fact_graph.num_edges), "remat": remat_label,
        }
        print(f"{name}: {t*1e3:.1f} ms", flush=True)

    train_leg("train_step_fwd_bwd_fb", task, "full")

    cfg_s = dataclasses.replace(
        cfg,
        entity=dataclasses.replace(cfg.entity, remat="save_rspmm"),
        relation=dataclasses.replace(cfg.relation, remat="save_rspmm"),
    )
    task_s = TransductiveKGTask(ds, cfg_s, TaskConfig(num_negative=128))
    train_leg("train_step_fwd_bwd_fb_save_rspmm", task_s, "save_rspmm")

    # the shipped default: remat='auto' resolves fastest-fits-first per
    # graph/batch (full-save + unrolled stack at FB scale on a 16 GB chip)
    cfg_a = dataclasses.replace(
        cfg,
        entity=dataclasses.replace(cfg.entity, remat="auto"),
        relation=dataclasses.replace(cfg.relation, remat="auto"),
    )
    task_a = TransductiveKGTask(ds, cfg_a, TaskConfig(num_negative=128))
    train_leg("train_step_fwd_bwd_fb_auto", task_a, "auto")

    # 6-layer pna entity tower fwd+bwd at B=32 (the round-4 headline's
    # workload): exercises the fused maxmin + addsq pair kernels through the
    # conv layer on the task's pna layout policy (interleaved, 256-row bwd
    # blocks)
    from ultra_torchdrug_tpu.models.nbfnet import entity_nbfnet_score_all

    cfg_p = dataclasses.replace(
        cfg,
        entity=dataclasses.replace(cfg.entity, aggregate_func="pna",
                                   remat=True),
    )
    task_p = TransductiveKGTask(ds, cfg_p, TaskConfig(num_negative=128))
    params_p = task_p.init_params(jax.random.PRNGKey(0))
    fact_und_p, relg_pp = task_p._prepare_graphs(task_p.fact_graph,
                                                 task_p.rel_graph)
    b32 = jnp.asarray(task_p.train_triples[:32])
    hp, rp = b32[:, 0], b32[:, 2]
    rq = _rel_queries(params_p, cfg_p, relg_pp, rp)

    def pna_loss(p):
        return entity_nbfnet_score_all(
            p["entity"], cfg_p.entity, fact_und_p, rq, hp, rp).sum()

    pna_vg = jax.value_and_grad(pna_loss)

    def make_pna_chain(n):
        @jax.jit
        def chain(p):
            def body(i, carry):
                p, acc = carry
                loss, grads = pna_vg(p)
                p = jax.tree_util.tree_map(
                    lambda a, ga: a + 1e-12 * ga, p, grads)
                return (p, acc + loss)
            p, acc = jax.lax.fori_loop(0, n, body, (p, jnp.float32(0.0)))
            return acc + first_scalar(p)
        return chain

    t = slope_time(make_pna_chain, (params_p,), lo_n=1, hi_n=3)
    results["pna_tower_fwd_bwd_b32"] = {
        "ms": round(t * 1e3, 1), "B": 32, "layers": 6,
        "V": int(ds.num_entities),
    }
    print(f"pna tower fwd+bwd (B=32): {t*1e3:.1f} ms", flush=True)

    ev_fn = task._build_eval_fn(task.fact_graph, task.rel_graph, task.graph)
    ebatch = jnp.asarray(task.eval_triples("valid")[:16])

    def make_eval_chain(n):
        @jax.jit
        def chain(p):
            def body(i, p):
                ranking, cand = ev_fn(p, ebatch)
                return tree_bump(p, jnp.sum(ranking.astype(jnp.float32)))
            return first_scalar(jax.lax.fori_loop(0, n, body, p))
        return chain

    t = slope_time(make_eval_chain, (params,), lo_n=1, hi_n=3)
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
