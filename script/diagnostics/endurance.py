"""Endurance run: flagship 3-graph pretrain mixture for thousands of steps
with checkpoint + eval interleaves (the td_ultra_3g schedule shape,
ref config/transductive/pretrain_3g.yaml:50-52 — 10 epochs x 20k bpe).

Captures per-window steps/s stability, host RSS creep, checkpoint/eval
interleave cost, and projects the 200k-step pretrain wall-clock. Writes
ENDURANCE.json at the repo root.

Usage (real TPU):
  python script/diagnostics/endurance.py [--steps 2000] [--window 100]
      [--eval-every 500] [--ckpt-every 500]
"""

import argparse
import dataclasses
import json
import os
import resource
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--window", type=int, default=100)
    ap.add_argument("--eval-every", type=int, default=500)
    ap.add_argument("--ckpt-every", type=int, default=500)
    ap.add_argument("--steps-per-call", type=int, default=1)
    ap.add_argument("--out", default=os.path.join(REPO, "ENDURANCE.json"))
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )

    from ultra_torchdrug_tpu.data.datasets import (
        JointDataset, synthetic_transductive,
    )
    from ultra_torchdrug_tpu.engine.engine import Engine
    from ultra_torchdrug_tpu.models.ultra import UltraConfig
    from ultra_torchdrug_tpu.tasks.task import MultiGraphPretrainTask, TaskConfig

    graphs = [
        synthetic_transductive("fb", 14541, 272115, 237, seed=0),
        synthetic_transductive("wn", 40943, 86835, 11, seed=1),
        synthetic_transductive("codex", 17050, 185584, 51, seed=2),
    ]
    ds = JointDataset("3g", graphs)
    impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    cfg = UltraConfig.default(max(g.num_relations for g in graphs),
                              rspmm_impl=impl)
    cfg = dataclasses.replace(
        cfg,
        entity=dataclasses.replace(cfg.entity, remat="auto"),
        relation=dataclasses.replace(cfg.relation, remat="auto"),
    )
    t0 = time.time()
    os.makedirs("/tmp/endurance", exist_ok=True)
    task = MultiGraphPretrainTask(ds, cfg, TaskConfig(num_negative=128))
    eng = Engine(task, batch_size=64, lr=5e-4, log_interval=args.window,
                 work_dir="/tmp/endurance", steps_per_call=args.steps_per_call)
    setup_s = time.time() - t0
    print(f"setup {setup_s:.1f}s", flush=True)

    def rss_gb():
        return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6

    windows = []
    events = []
    done = 0
    t_run0 = time.time()
    while done < args.steps:
        n = min(args.window, args.steps - done)
        t0 = time.time()
        eng.train(num_epoch=1, batch_per_epoch=n)
        dt = time.time() - t0
        done += n
        windows.append({
            "step": done, "s_per_step": round(dt / n, 4),
            "rss_gb": round(rss_gb(), 3),
        })
        print(f"step {done}: {dt / n * 1e3:.0f} ms/step rss {rss_gb():.2f} GB",
              flush=True)
        if args.ckpt_every and done % args.ckpt_every == 0:
            t0 = time.time()
            eng.save("/tmp/endurance/ckpt.pkl")
            events.append({"step": done, "ckpt_s": round(time.time() - t0, 2)})
        if args.eval_every and done % args.eval_every == 0:
            t0 = time.time()
            m = eng.evaluate("valid", fast_test=64)
            events.append({
                "step": done, "eval_s": round(time.time() - t0, 2),
                "mrr": round(m["mrr"], 4),
            })
            print(f"  eval@{done}: mrr {m['mrr']:.4f} "
                  f"({events[-1]['eval_s']}s)", flush=True)
    total_s = time.time() - t_run0

    # steady-state rate from the second half (excludes compile windows)
    half = [w["s_per_step"] for w in windows[len(windows) // 2:]]
    steady = sum(half) / len(half)
    first_half = [w["s_per_step"] for w in windows[: len(windows) // 2]]
    out = {
        "measured_at": time.strftime("%Y-%m-%d"),
        "backend": jax.default_backend(),
        "steps": args.steps,
        "steps_per_call": args.steps_per_call,
        "setup_s": round(setup_s, 1),
        "total_s": round(total_s, 1),
        "steady_s_per_step": round(steady, 4),
        "drift_second_half_vs_first": round(
            steady / (sum(first_half) / len(first_half)) - 1, 4),
        "rss_start_gb": windows[0]["rss_gb"],
        "rss_end_gb": windows[-1]["rss_gb"],
        "projected_200k_steps_hours": round(steady * 200000 / 3600, 2),
        "windows": windows,
        "events": events,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items()
                      if k not in ("windows", "events")}), flush=True)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
