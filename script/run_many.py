"""Multi-dataset sequential sweep driver with per-dataset default epoch/bpe
tables, seed repeats, and a CSV results dump.

Mirrors /root/reference/script/run_many.py: `-d DatasetA:v1,DatasetB:v2
--finetune --reps N` picks (epochs, batches-per-epoch) from the default
training or finetuning tables (reference :25-115), runs each experiment via
run_full's machinery, and appends a metrics row per run to
ultra_results_<timestamp>.csv.
"""

import argparse
import csv
import os
import sys
import time

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.append(os.path.dirname(os.path.abspath(__file__)))

import run_full  # noqa: E402

from ultra_torchdrug_tpu.engine.build import build_dataset, build_engine, build_task  # noqa: E402
from ultra_torchdrug_tpu.utils.config import load_config  # noqa: E402
from ultra_torchdrug_tpu.utils.logging import create_working_directory, get_root_logger  # noqa: E402

SEEDS = [1024, 42, 1337, 512, 256]

# (num_epoch, batch_per_epoch) tables — verbatim from the reference
# run_many.py:25-115 ("null" = one pass over all train triples). Hetionet is
# kept for table parity even though neither repo ships its loader. The two
# Synth* entries are this framework's own offline smoke datasets.
DEFAULT_FINETUNING = {
    "CoDExSmall": (1, 4000), "CoDExMedium": (1, 4000), "CoDExLarge": (1, 2000),
    "FB15k237": (1, "null"), "WN18RR": (1, "null"), "YAGO310": (1, 2000),
    "DBpedia100k": (1, 1000), "AristoV4": (1, 2000),
    "ConceptNet100k": (1, 2000), "ATOMIC": (1, 200), "NELL995": (1, "null"),
    "Hetionet": (1, 4000),
    "WDsinger": (3, "null"), "FB15k237_10": (1, "null"),
    "FB15k237_20": (1, "null"), "FB15k237_50": (1, 1000),
    "NELL23k": (3, "null"),
    "FB15k237Inductive": (1, "null"), "WN18RRInductive": (1, "null"),
    "NELLInductive": (3, "null"), "ILPC2022SmallInductive": (3, "null"),
    "ILPC2022LargeInductive": (1, 1000), "FBIngram": (3, "null"),
    "WKIngram": (3, "null"), "NLIngram": (3, "null"), "FBNELL": (3, "null"),
    "Metafam": (3, "null"), "WikiTopicsMT1": (3, "null"),
    "WikiTopicsMT2": (3, "null"), "WikiTopicsMT3": (3, "null"),
    "WikiTopicsMT4": (3, "null"), "HamaguchiBM": (1, 100),
    "SynthKG": (1, 10), "SynthInductiveKG": (1, 10),
}
DEFAULT_TRAINING = {
    "CoDExSmall": (10, 1000), "CoDExMedium": (10, 1000),
    "CoDExLarge": (10, 1000), "FB15k237": (10, 1000), "WN18RR": (10, 1000),
    "YAGO310": (10, 2000), "DBpedia100k": (10, 1000), "AristoV4": (10, 1000),
    "ConceptNet100k": (10, 1000), "ATOMIC": (10, 1000),
    "NELL995": (10, 1000), "Hetionet": (10, 1000),
    "WDsinger": (10, 1000), "FB15k237_10": (10, 1000),
    "FB15k237_20": (10, 1000), "FB15k237_50": (10, 1000),
    "NELL23k": (10, 1000),
    "FB15k237Inductive": (10, "null"), "WN18RRInductive": (10, "null"),
    "NELLInductive": (10, "null"), "ILPC2022SmallInductive": (10, "null"),
    "ILPC2022LargeInductive": (10, 1000), "FBIngram": (10, "null"),
    "WKIngram": (10, "null"), "NLIngram": (10, "null"), "FBNELL": (10, "null"),
    "Metafam": (10, "null"), "WikiTopicsMT1": (10, "null"),
    "WikiTopicsMT2": (10, "null"), "WikiTopicsMT3": (10, "null"),
    "WikiTopicsMT4": (10, "null"), "HamaguchiBM": (10, 1000),
    "SynthKG": (10, 10), "SynthInductiveKG": (10, 10),
}


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("-c", "--config", required=True)
    p.add_argument("-d", "--datasets", required=True,
                   help="comma-separated Dataset[:version] list")
    p.add_argument("--ckpt", default=None)
    p.add_argument("--gpus", default="null")
    p.add_argument("--finetune", action="store_true")
    p.add_argument("--train", action="store_true")
    p.add_argument("-reps", "--repeats", type=int, default=1)
    p.add_argument("--epochs", type=int, default=0)
    p.add_argument("--bpe", default="null")
    return p.parse_args()


def main():
    args = parse_args()
    datasets = [d.strip() for d in args.datasets.split(",") if d.strip()]
    csv_path = os.path.abspath(
        f"ultra_results_{time.strftime('%Y-%m-%d-%H-%M-%S')}.csv"
    )
    rows = []
    for spec in datasets:
        name, _, version = spec.partition(":")
        if args.finetune:
            epochs, bpe = DEFAULT_FINETUNING.get(name, (1, "null"))
        elif args.train:
            epochs, bpe = DEFAULT_TRAINING.get(name, (10, 1000))
        else:
            epochs, bpe = args.epochs, args.bpe
        for rep in range(args.repeats):
            seed = SEEDS[rep % len(SEEDS)]
            context = {
                "dataset": name, "version": version or "v1",
                "epochs": epochs, "bpe": bpe,
                "gpus": args.gpus, "ckpt": args.ckpt,
            }
            cfg = load_config(args.config, context=context)[0]
            work_dir = create_working_directory(
                cfg.get("output_dir", "./output"), cfg["task"]["class"],
                name, cfg["task"]["model"]["class"],
            )
            logger = get_root_logger(os.path.join(work_dir, "log.txt"))
            logger.info(f"=== {spec} rep {rep} seed {seed} ===")
            run_full.set_seed(seed)
            dataset = build_dataset(cfg["dataset"])
            from ultra_torchdrug_tpu.engine.build import mesh_scope

            with mesh_scope(cfg) as (mesh, edge_axis, rel_edge_axis):
                task = build_task(cfg["task"], dataset,
                                  rspmm_impl=cfg.get("rspmm_impl", "auto"),
                                  seed=seed, edge_axis=edge_axis,
                                  rel_edge_axis=rel_edge_axis)
                engine = build_engine(cfg, task, work_dir=work_dir, seed=seed,
                                      mesh=mesh)
                if args.ckpt and args.ckpt not in ("null", "None"):
                    engine.load(os.path.expanduser(args.ckpt))
                # reference wraps sweep runs in set_detect_anomaly(True) too
                # (run_many.py:229); opt-in here like run_full (the JAX
                # analog disables async dispatch)
                if cfg.get("detect_anomaly"):
                    from ultra_torchdrug_tpu.utils.debug import detect_anomaly

                    with detect_anomaly():
                        run_full.train_and_validate(cfg, engine, logger)
                        metrics = engine.evaluate(
                            "test", fast_test=cfg.get("fast_test")
                        )
                else:
                    run_full.train_and_validate(cfg, engine, logger)
                    metrics = engine.evaluate(
                        "test", fast_test=cfg.get("fast_test")
                    )
            row = {"dataset": spec, "seed": seed,
                   **{k: v for k, v in metrics.items() if not isinstance(v, dict)}}
            rows.append(row)
            fields = sorted({k for r in rows for k in r})
            with open(csv_path, "w", newline="") as f:
                writer = csv.DictWriter(f, fieldnames=fields)
                writer.writeheader()
                writer.writerows(rows)
            logger.info(f"results -> {csv_path}")
    print(csv_path)


if __name__ == "__main__":
    main()
