"""Forward AND backward attribution of the FB-scale train step.

Round-3 verdict: ~260 ms of the 417.8 ms step (remat=save_rspmm) was
unattributed beyond the forward legs. This harness slope-times every leg
fwd and fwd+bwd (chain two depths inside one jit; the difference cancels the
15-40 ms remote-tunnel dispatch constant) and writes BENCH_BREAKDOWN.json.

Usage:  python script/diagnostics/step_breakdown_bwd.py [--out FILE]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_BREAKDOWN.json"))
    # default: the SHIPPED configuration — remat='auto' resolved exactly the
    # way the task layer resolves it (VERDICT r4 #5: the itemization must
    # describe the step users actually run)
    ap.add_argument("--remat", default="auto")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )

    from ultra_torchdrug_tpu.data.datasets import synthetic_transductive
    from ultra_torchdrug_tpu.models.nbfnet import entity_nbfnet_score_all
    from ultra_torchdrug_tpu.models.ultra import (
        UltraConfig, _mask_easy_edges, _rel_queries, ultra_train_scores,
    )
    from ultra_torchdrug_tpu.ops.sampling import strict_negatives
    from ultra_torchdrug_tpu.tasks.task import TaskConfig, TransductiveKGTask

    impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    ds = synthetic_transductive("fb", 14541, 272115, 237, seed=0)
    cfg = UltraConfig.default(ds.num_relations, rspmm_impl=impl)
    cfg = dataclasses.replace(
        cfg,
        entity=dataclasses.replace(cfg.entity, remat=args.remat),
        relation=dataclasses.replace(cfg.relation, remat=args.remat),
    )
    task = TransductiveKGTask(ds, cfg, TaskConfig(num_negative=128))
    fact, relg = task.fact_graph, task.rel_graph
    remat_label = args.remat
    if args.remat == "auto":
        # resolve through the task's own policy (full-save + unroll at FB
        # scale on a 16 GB chip) so every leg below measures the shipped step
        cfg = task._resolve_model_cfg(fact, batch=64)
        remat_label = (
            f"auto->{cfg.entity.remat}/{cfg.entity.stack}"
        )
        print(f"resolved shipped policy: {remat_label}", flush=True)
    fact_j = fact.prepare_join()
    fact_und, relg_p = task._prepare_graphs(fact_j, relg)
    params = task.init_params(jax.random.PRNGKey(0))

    B, N = 64, 128
    batch = jnp.asarray(task.train_triples[:B])
    h, t, r = batch[:, 0], batch[:, 1], batch[:, 2]
    key = jax.random.PRNGKey(1)
    results = {
        "backend": jax.default_backend(),
        "remat": remat_label,
        "measured_at": time.strftime("%Y-%m-%d"),
        "B": B, "V": int(ds.num_entities),
        "E_und": int(2 * fact.num_edges),
    }

    def slope(name, fn, *fargs, chain=(1, 3), repeats=3):
        """fn(eps_scalar, *fargs) -> scalar; eps serializes the chain."""
        def make(n):
            @jax.jit
            def run(*fa):
                s = jnp.float32(0.0)
                for _ in range(n):
                    s = s + fn(s * 1e-30, *fa)
                return s
            return run

        lo, hi = make(chain[0]), make(chain[1])
        float(lo(*fargs))
        float(hi(*fargs))
        tl = th = float("inf")
        for _ in range(repeats):
            t0 = time.time()
            float(lo(*fargs))
            tl = min(tl, time.time() - t0)
            t0 = time.time()
            float(hi(*fargs))
            th = min(th, time.time() - t0)
        ms = (th - tl) / (chain[1] - chain[0]) * 1e3
        # sub-ms legs can slope to small negatives (tunnel noise); publishing
        # a negative timing is noise masquerading as measurement — clamp
        ms = max(ms, 0.0)
        results[name] = round(ms, 2)
        print(f"{name}: {ms:.2f} ms", flush=True)
        return ms

    def padd(p, eps):
        return jax.tree_util.tree_map(lambda a: a + eps, p)

    def gsum(g):
        # consume every gradient leaf: an unused grad tree is dead code and
        # XLA deletes the whole backward pass (round-4 harness bug — the
        # first capture measured fwd+bwd == fwd)
        return sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(g))

    # ---- sampling + mask ---------------------------------------------------
    slope("neg_sample_fwd", lambda e, k: strict_negatives(
        k, fact.edge_list, h, t, r, fact.num_nodes, N
    ).sum().astype(jnp.float32) + e, key)

    neg = strict_negatives(key, fact.edge_list, h, t, r, fact.num_nodes, N)
    hi_ = jnp.broadcast_to(h[:, None], (B, N + 1))
    ti_ = jnp.broadcast_to(t[:, None], (B, N + 1))
    ri_ = jnp.broadcast_to(r[:, None], (B, N + 1))
    slope("easy_mask_sort_join_fwd", lambda e: _mask_easy_edges(
        cfg, fact, hi_ + jnp.int32(e), ti_, ri_).edge_weight.sum())
    slope("easy_mask_indexed_fwd", lambda e: _mask_easy_edges(
        cfg, fact_j, hi_ + jnp.int32(e), ti_, ri_).edge_weight.sum())

    # ---- relation tower ----------------------------------------------------
    slope("rel_tower_fwd", lambda e, p: _rel_queries(
        padd(p, e), cfg, relg_p, r).sum(), params)
    def rel_bwd(e, p):
        v, g = jax.value_and_grad(
            lambda q: _rel_queries(q, cfg, relg_p, r).sum())(padd(p, e))
        return v + gsum(g)

    slope("rel_tower_fwd_bwd", rel_bwd, params)

    # ---- entity tower: all-V scoring vs target scoring ---------------------
    rq = _rel_queries(params, cfg, relg_p, r)
    tgt = jnp.concatenate([t[:, None], neg], axis=1)

    def ent_all(p):
        return entity_nbfnet_score_all(
            p["entity"], cfg.entity, fact_und, rq, h, r).sum()

    def ent_tgt(p):
        return entity_nbfnet_score_all(
            p["entity"], cfg.entity, fact_und, rq, h, r, targets=tgt).sum()

    slope("entity_fwd_scoreall", lambda e, p: ent_all(padd(p, e)), params)
    slope("entity_fwd_targets", lambda e, p: ent_tgt(padd(p, e)), params)
    def ent_bwd(fn):
        def leg(e, p):
            v, g = jax.value_and_grad(fn)(padd(p, e))
            return v + gsum(g)
        return leg

    slope("entity_fwd_bwd_scoreall", ent_bwd(ent_all), params)
    slope("entity_fwd_bwd_targets", ent_bwd(ent_tgt), params)

    # ---- full loss ---------------------------------------------------------
    from ultra_torchdrug_tpu.tasks.kg import bce_self_adversarial

    def full_loss(p, k):
        nn = strict_negatives(k, fact.edge_list, h, t, r, fact.num_nodes, N)
        s = ultra_train_scores(p, cfg, fact_j, relg_p, h, t, r, nn,
                               fact_graph_und=fact_und)
        return bce_self_adversarial(s, 1.0)

    slope("loss_fwd", lambda e, p, k: full_loss(padd(p, e), k), params, key)
    def loss_bwd(e, p, k):
        v, g = jax.value_and_grad(full_loss)(padd(p, e), k)
        return v + gsum(g)

    slope("loss_fwd_bwd", loss_bwd, params, key)

    # ---- optimizer glue ----------------------------------------------------
    import optax

    from ultra_torchdrug_tpu.engine.engine import make_optimizer

    tx = make_optimizer("AdamW", 5e-4)
    opt_state = tx.init(params)
    grads = jax.jit(jax.grad(full_loss))(params, key)

    def opt_leg(e, g, s):
        g = padd(g, e)
        updates, s2 = tx.update(g, s, params)
        p2 = optax.apply_updates(params, updates)
        gn = optax.global_norm(g)
        return jax.tree_util.tree_leaves(p2)[0].sum() + gn + \
            jax.tree_util.tree_leaves(s2)[0].ravel()[0]

    slope("optimizer_update", opt_leg, grads, opt_state, chain=(1, 5))

    # ---- end-to-end engine-style step (params chained naturally) -----------
    def make_step(n):
        @jax.jit
        def run(p, s, k):
            for i in range(n):
                kk = jax.random.fold_in(k, i)
                (l, _), g = jax.value_and_grad(
                    lambda q: (full_loss(q, kk), ()), has_aux=True)(p)
                updates, s = tx.update(g, s, p)
                p = optax.apply_updates(p, updates)
            return l

        return run

    lo, hi = make_step(1), make_step(3)
    float(lo(params, opt_state, key))
    float(hi(params, opt_state, key))
    tl = th = float("inf")
    for _ in range(3):
        t0 = time.time()
        float(lo(params, opt_state, key))
        tl = min(tl, time.time() - t0)
        t0 = time.time()
        float(hi(params, opt_state, key))
        th = min(th, time.time() - t0)
    ms = (th - tl) / 2 * 1e3
    results["train_step_total"] = round(ms, 2)
    print(f"train_step_total: {ms:.2f} ms", flush=True)

    # derived attribution
    results["derived"] = {
        "backward_only_loss": round(
            results["loss_fwd_bwd"] - results["loss_fwd"], 2),
        "head_cost_scoreall_minus_targets_fwd_bwd": round(
            results["entity_fwd_bwd_scoreall"]
            - results["entity_fwd_bwd_targets"], 2),
        "mask_saving_indexed": round(
            results["easy_mask_sort_join_fwd"]
            - results["easy_mask_indexed_fwd"], 2),
        "glue_step_minus_loss_bwd_minus_opt": round(
            results["train_step_total"] - results["loss_fwd_bwd"]
            - results["optimizer_update"], 2),
    }
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
