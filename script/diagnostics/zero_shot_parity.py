"""One-command zero-shot parity gate (VERDICT r2 #8).

Runs the full td_ultra_* zero-shot flow — .pth import -> per-split relation
graphs -> all-entity filtered eval — the moment real checkpoints/datasets
appear. The acceptance target (BASELINE.md): zero-shot test MRR on
FB15k237Inductive v1 within +/-0.002 of the reference run with td_ultra_4g
(/root/reference/README.md:55-61,87-91).

Usage once artifacts exist (dataset caches under ~/kg-datasets/, reference
checkpoints anywhere):

  python script/diagnostics/zero_shot_parity.py \
      --ckpt ~/ckpts/td_ultra_4g.pth \
      --dataset FB15k237Inductive --version v1 \
      --expected-mrr <reference MRR> --tolerance 0.002

Offline rehearsal (exercised by tests/test_zero_shot_pipeline.py and usable
any time): --dataset SynthInductiveKG with a synthetic flagship-architecture
checkpoint.

Prints one JSON line with the metrics and, when --expected-mrr is given,
exits non-zero on a gate miss.
"""

import argparse
import json
import os
import sys

sys.path.append(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True, help=".pth (reference layout) or native .ckpt")
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--version", default=None)
    ap.add_argument("--split", default="test", choices=["valid", "test"])
    ap.add_argument("--data-path", default="~/kg-datasets/")
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--fast-test", type=int, default=None)
    ap.add_argument("--rspmm-impl", default="auto")
    ap.add_argument("--expected-mrr", type=float, default=None)
    ap.add_argument("--tolerance", type=float, default=0.002)
    args = ap.parse_args(argv)

    from ultra_torchdrug_tpu.engine.build import (
        build_dataset, build_engine, build_task,
    )

    ds_cfg = {"class": args.dataset, "path": args.data_path}
    if args.version:
        ds_cfg["version"] = args.version
    dataset = build_dataset(ds_cfg)

    task_cfg = {
        # the flagship architecture every td_ultra_* checkpoint was trained
        # with (config/inductive/inference.yaml)
        "class": "InductiveKnowledgeGraphCompletionAdapted",
        "model": {
            "class": "TransferNBFNet",
            "input_dim": 64,
            "hidden_dims": [64] * 6,
            "message_func": "distmult",
            "aggregate_func": "sum",
            "short_cut": True,
            "layer_norm": True,
            "project": True,
            "mod": True,
        },
        "rel_models": {
            "class": "RelationModelList",
            "num_rel_models": 1,
            "rel_model": {
                "class_str": "RelNBFNet",
                "input_dim": 64,
                "input_type": "ones",
                "num_layers": 6,
                "hidden": 64,
            },
        },
        "criterion": "bce",
        "num_negative": 128,
        "strict_negative": True,
        "adversarial_temperature": 1.0,
        "full_batch_eval": True,
        "remat": "auto",
    }
    cfg = {
        "task": task_cfg,
        "engine": {"batch_size": args.batch_size},
        "optimizer": {"class": "AdamW", "lr": 5e-4},
    }
    task = build_task(task_cfg, dataset, rspmm_impl=args.rspmm_impl)
    import tempfile

    engine = build_engine(cfg, task, work_dir=tempfile.mkdtemp(prefix="zsp_"))
    engine.load(args.ckpt)

    metrics = engine.evaluate(args.split, fast_test=args.fast_test)
    out = {
        "dataset": args.dataset,
        "version": args.version,
        "split": args.split,
        "ckpt": os.path.basename(args.ckpt),
        **{k: float(v) for k, v in metrics.items() if not isinstance(v, dict)},
    }
    ok = True
    if args.expected_mrr is not None:
        delta = abs(out["mrr"] - args.expected_mrr)
        out["expected_mrr"] = args.expected_mrr
        out["delta"] = delta
        ok = delta <= args.tolerance
        out["parity_gate"] = "PASS" if ok else "FAIL"
    print(json.dumps(out))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
