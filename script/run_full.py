"""Single-experiment driver: config -> dataset -> task -> engine -> train/eval.

CLI-compatible with the reference's script/run_full.py (/root/reference/script/
run_full.py): `python script/run_full.py -c <yaml> --dataset X --version vN
--epochs N --bpe N --ckpt path`, with undeclared template variables in the
YAML auto-exposed as required flags. `--gpus` is accepted for config
compatibility and ignored — device selection is JAX's.
"""

import math
import os
import pprint
import random
import sys

import numpy as np

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ultra_torchdrug_tpu.engine.build import build_dataset, build_engine, build_task
from ultra_torchdrug_tpu.utils.config import load_config, parse_args
from ultra_torchdrug_tpu.utils.logging import create_working_directory, get_root_logger


def set_seed(seed: int):
    import jax

    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def train_and_validate(cfg, engine, logger):
    """Epoch chunks with best-checkpoint selection (reference run_full.py:62-90)."""
    num_epoch = cfg.get("train", {}).get("num_epoch", 0)
    if num_epoch == 0:
        return
    bpe = cfg.get("train", {}).get("batch_per_epoch")
    fast_test = cfg.get("fast_test")
    step = math.ceil(num_epoch / 10)
    best_result, best_epoch = float("-inf"), -1
    metric_name = cfg.get("metric", "mrr")
    for i in range(0, num_epoch, step):
        engine.train(num_epoch=min(step, num_epoch - i), batch_per_epoch=bpe)
        path = os.path.join(engine.work_dir, f"model_epoch_{engine.epoch}.ckpt")
        engine.save(path)
        metric = engine.evaluate("valid", fast_test=fast_test)
        result = metric[metric_name]
        if result > best_result:
            best_result, best_epoch = result, engine.epoch
    best = os.path.join(engine.work_dir, f"model_epoch_{best_epoch}.ckpt")
    logger.info(f"Load best checkpoint from epoch {best_epoch}")
    engine.load(best)


def test(cfg, engine):
    fast_test = cfg.get("fast_test")
    engine.evaluate("valid", fast_test=fast_test)
    if cfg.get("no_test"):
        return
    engine.evaluate("test", fast_test=fast_test)


def main(argv=None):
    import os as _os

    try:  # persistent XLA/Mosaic compile cache (compiles are minutes here)
        import jax as _jax

        _cache = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), 
                               "../.jax_cache")
        _jax.config.update("jax_compilation_cache_dir", _cache)
    except Exception:
        pass
    args, context = parse_args(argv)
    cfg = load_config(args.config, context=context)[0]
    work_dir = create_working_directory(
        cfg.get("output_dir", "./output"),
        cfg["task"]["class"],
        str(cfg["dataset"]["class"]),
        cfg["task"]["model"]["class"],
    )
    set_seed(args.seed)
    logger = get_root_logger(os.path.join(work_dir, "log.txt"))
    logger.info(f"Config file: {args.config}")
    logger.info(pprint.pformat(cfg))

    if cfg.get("debug"):
        from ultra_torchdrug_tpu.utils.debug import setup_debug_hook

        setup_debug_hook()
    dataset = build_dataset(cfg["dataset"])
    # multi-chip: `parallel: {data: N, edge: M}` builds the mesh; it must be
    # active for the task build (graph partitioning happens at jit-build time)
    # and for training/eval (the conv reads current_mesh() at trace time)
    from ultra_torchdrug_tpu.engine.build import mesh_scope

    with mesh_scope(cfg) as (mesh, edge_axis, rel_edge_axis):
        task = build_task(
            cfg["task"], dataset, rspmm_impl=cfg.get("rspmm_impl", "auto"),
            seed=args.seed, edge_axis=edge_axis, rel_edge_axis=rel_edge_axis,
        )
        engine = build_engine(cfg, task, work_dir=work_dir, seed=args.seed,
                              mesh=mesh)
        if "checkpoint" in cfg and cfg["checkpoint"] not in (None, "null", "None"):
            engine.load(
                os.path.expanduser(str(cfg["checkpoint"])),
                fix_reasoner=bool(cfg.get("fix_reasoner", False)),
            )
        # the reference wraps the whole run in set_detect_anomaly(True)
        # (run_full.py:127); the JAX analog (jax_debug_nans/infs) disables
        # async dispatch, so it is opt-in via `detect_anomaly: true`
        if cfg.get("detect_anomaly"):
            from ultra_torchdrug_tpu.utils.debug import detect_anomaly

            with detect_anomaly():
                train_and_validate(cfg, engine, logger)
                test(cfg, engine)
        else:
            train_and_validate(cfg, engine, logger)
            test(cfg, engine)
    return engine


if __name__ == "__main__":
    main()
