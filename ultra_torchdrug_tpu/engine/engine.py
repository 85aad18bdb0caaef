"""Training engine: optimizer loop, evaluation orchestration, checkpoints.

The solver layer of the framework — the role torchdrug's core.Engine plus the
reference's MultiGraphEngine play (/root/reference/ultra/engine.py): epoch
loop with batch_per_epoch, gradient accumulation (gradient_interval), meter
logging, per-split evaluation, model save/load. Device parallelism is a JAX
mesh (see parallel/), not DDP: the jitted step consumes sharded batches and
XLA inserts the gradient psums.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..tasks.task import MultiGraphPretrainTask
from ..utils import checkpoint as ckpt_io
from ..utils.logging import Meter, get_root_logger


def _is_oom_error(e: Exception) -> bool:
    """XLA surfaces device OOM as an XlaRuntimeError whose message carries
    RESOURCE_EXHAUSTED / 'out of memory'; match on the message so the check
    is backend-agnostic (tunnel backends wrap the exception type)."""
    s = str(e)
    return ("RESOURCE_EXHAUSTED" in s or "Out of memory" in s
            or "out of memory" in s)


def make_optimizer(
    name: str = "AdamW",
    lr: float = 5e-4,
    weight_decay: float = 0.01,
    gradient_interval: int = 1,
    clip_grad: Optional[float] = None,
):
    name = name.lower()
    if name == "adamw":
        tx = optax.adamw(lr, weight_decay=weight_decay)
    elif name == "adam":
        tx = optax.adam(lr)
    elif name == "sgd":
        tx = optax.sgd(lr)
    else:
        raise ValueError(f"unknown optimizer {name!r}")
    if clip_grad:
        tx = optax.chain(optax.clip_by_global_norm(clip_grad), tx)
    if gradient_interval > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=gradient_interval)
    return tx


class Engine:
    def __init__(
        self,
        task,
        batch_size: int = 64,
        optimizer: str = "AdamW",
        lr: float = 5e-4,
        gradient_interval: int = 1,
        clip_grad: Optional[float] = None,
        log_interval: int = 100,
        seed: int = 1024,
        work_dir: str = ".",
        logger=None,
        mesh=None,
        steps_per_call: int = 1,
        metric_logger=None,
    ):
        self.task = task
        self.batch_size = batch_size
        # steps_per_call > 1 chains K optimizer steps inside one jit via
        # lax.scan over K presampled batches: one host dispatch per K steps,
        # amortizing remote-tunnel dispatch latency (~15-40 ms each). For the
        # multigraph task the mixture graph is drawn once per chunk instead of
        # once per batch (a documented sampling-granularity delta vs the
        # reference engine.py:44-57).
        self.steps_per_call = max(1, int(steps_per_call))
        self.mesh = mesh  # optional jax Mesh with a "data" axis (DP)
        self.work_dir = work_dir
        self.logger = logger or get_root_logger(os.path.join(work_dir, "log.txt"))
        # metric_logger: optional structured sink (WandbLogger) fed window
        # means + eval dicts through the meter — the `engine.logger: wandb`
        # config key (reference engine config; core.Engine logger kwarg)
        self.metric_logger = metric_logger
        self.meter = Meter(self.logger, log_interval, sink=metric_logger)
        self.rng = np.random.default_rng(seed)
        self.key = jax.random.PRNGKey(seed)
        self.params = task.init_params(self._next_key())
        self.tx = make_optimizer(optimizer, lr, gradient_interval=gradient_interval,
                                 clip_grad=clip_grad)
        self.opt_state = self.tx.init(self.params)
        self.epoch = 0
        self._is_multigraph = isinstance(task, MultiGraphPretrainTask)
        self._step_fns = {}
        self._warmed_steps = set()  # graph_ids whose step_fn has succeeded
        self.profile_dir: Optional[str] = None  # set to capture a JAX trace

    def _next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    # ------------------------------------------------------------------

    def _get_step_fn(self, graph_id):
        """One jitted (loss+grad+update) per propagation graph."""
        if graph_id in self._step_fns:
            return self._step_fns[graph_id]

        base_key = self._next_key()

        def one_step(params, opt_state, step_idx, batch, sample_weight):
            # key derivation lives INSIDE the jit: a host-side
            # jax.random.split would be its own device dispatch every step
            # (remote-TPU tunnels pay real latency per dispatch)
            key = jax.random.fold_in(base_key, step_idx)

            def loss_fn(p):
                if self._is_multigraph:
                    # the per-graph jitted loss inlines into this jit
                    return self.task._loss_fns[graph_id](p, key, batch, None)
                return self.task._loss_fn(p, key, batch, sample_weight)

            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            metrics = dict(metrics)
            metrics["grad_norm"] = optax.global_norm(grads)
            return params, opt_state, metrics

        if self.steps_per_call == 1:
            step = one_step
        else:
            # K steps chained inside the jit: batch is [K, B, 3],
            # sample_weight [K, B] or None; metrics come back stacked [K].
            def step(params, opt_state, step_idx, batch, sample_weight):
                def body(carry, xs):
                    p, s, i = carry
                    b = xs if sample_weight is None else xs[0]
                    sw = None if sample_weight is None else xs[1]
                    p, s, m = one_step(p, s, i, b, sw)
                    return (p, s, i + jnp.uint32(1)), m

                xs = batch if sample_weight is None else (batch, sample_weight)
                (params, opt_state, _), metrics = jax.lax.scan(
                    body, (params, opt_state, step_idx), xs
                )
                return params, opt_state, metrics

        if self._is_multigraph:
            # build (never execute) the per-graph loss fn: it inlines into
            # this step's jit, so a standalone compile would be thrown away
            self.task.ensure_loss_fn(graph_id)
        kwargs = {}
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(self.mesh, P())
            # chunked batches carry a leading K (scan) dim ahead of batch
            bspec = P("data") if self.steps_per_call == 1 else P(None, "data")
            batch_sh = NamedSharding(self.mesh, bspec)
            kwargs = dict(
                in_shardings=(rep, rep, rep, batch_sh, rep),
                out_shardings=(rep, rep, rep),
            )
        fn = jax.jit(step, donate_argnums=(0, 1), **kwargs)
        self._step_fns[graph_id] = fn
        return fn

    def _full_batch(self, edges: np.ndarray, idx: np.ndarray) -> np.ndarray:
        batch = edges[idx]
        if len(batch) < self.batch_size:
            reps = -(-self.batch_size // len(batch))
            batch = np.tile(batch, (reps, 1))[: self.batch_size]
        return batch

    def _edges_per_step(self, graph_id=0) -> int:
        """Propagated edges per optimizer step (undirected entity graph x
        layers x fwd+bwd) — the throughput telemetry denominator."""
        task = self.task
        if self._is_multigraph:
            fact = task.fact_graphs[graph_id]
        elif hasattr(task, "fact_graph"):
            fact = task.fact_graph
        else:
            fact = task.dataset.train_graph
        layers = len(task.model_cfg.entity.hidden_dims)
        return 2 * fact.num_edges * layers * 2  # und edges x layers x fwd/bwd

    def _epoch_chunks(self, batch_per_epoch: Optional[int]):
        """Yield (graph_id, k, device_batch, sample_weight) per dispatch.
        Runs on the prefetch worker: numpy batch assembly AND the
        host->device transfer happen one chunk ahead of the dispatch loop
        (the reference's DataLoader worker prefetch, engine.py:48-51 — here
        a single thread suffices since sampling is device-side)."""
        task = self.task
        K = self.steps_per_call
        if self._is_multigraph:
            bpe = batch_per_epoch or 1000
            done = 0
            while done < bpe:
                # one mixture draw per chunk (see steps_per_call note)
                gid = task.sample_graph_id(self.rng)
                edges = task.train_triples[gid]
                batch = np.stack([
                    self._full_batch(
                        edges, self.rng.permutation(len(edges))[: self.batch_size]
                    )
                    for _ in range(K)
                ])
                if K == 1:
                    batch = batch[0]
                yield gid, K, jnp.asarray(batch), None
                done += K
        else:
            triples = task.train_triples
            order = self.rng.permutation(len(triples))
            n_batches = len(order) // self.batch_size
            bpe = min(batch_per_epoch or n_batches, n_batches) or 1
            # K > 1 rounds the epoch up to whole chunks, wrapping into the
            # start of the permutation (same wrap rule as short batches) —
            # at most K-1 extra steps per epoch vs the reference loop
            for c in range(-(-bpe // K)):
                batches, sws = [], []
                for i in range(c * K, c * K + K):
                    lo = (i % bpe) * self.batch_size
                    idx = order[lo : lo + self.batch_size]
                    if len(idx) < self.batch_size:
                        idx = np.concatenate(
                            [idx, order[: self.batch_size - len(idx)]]
                        )
                    # _full_batch backstops datasets smaller than half a
                    # batch, where one wrap still underfills
                    batches.append(self._full_batch(triples, idx))
                    sws.append(task.sample_weight_for(batches[-1]))
                if K == 1:
                    batch, sw = batches[0], sws[0]
                else:
                    batch = np.stack(batches)
                    sw = None if sws[0] is None else jnp.stack(sws)
                yield 0, K, jnp.asarray(batch), sw

    def _demote(self, reason: str) -> bool:
        """Fail-soft on device OOM: walk the task's auto policies one tier
        down the memory ladder and invalidate every compiled step (they close
        over the task's jitted loss fns). Returns False when the task has no
        tier left (pinned policies / ladder exhausted)."""
        if not hasattr(self.task, "demote_policy"):
            return False
        if not self.task.demote_policy(reason):
            return False
        self.logger.warning(
            f"device OOM -> demoted auto policies to tier "
            f"{self.task._policy_demotion}; recompiling step"
        )
        self._step_fns.clear()
        self._warmed_steps.clear()
        return True

    def _run_step(self, gid, batch, sw):
        """Execute one (possibly K-chained) optimizer step with fail-soft OOM
        handling. Static shapes make step memory deterministic, so an OOM can
        only surface on a step_fn's FIRST execution — params/opt_state are
        snapshotted there (they are donated and a failed execution may have
        consumed them), restored, and the step retried one policy tier down."""
        while True:
            step_fn = self._get_step_fn(gid)
            first_run = gid not in self._warmed_steps
            if first_run:
                snap = jax.tree_util.tree_map(
                    jnp.copy, (self.params, self.opt_state))
            try:
                self.params, self.opt_state, metrics = step_fn(
                    self.params, self.opt_state,
                    np.uint32(self.meter.global_step), batch, sw,
                )
                if first_run:
                    self._warmed_steps.add(gid)
                return metrics
            except Exception as e:
                if not (first_run and _is_oom_error(e)):
                    raise
                self.params, self.opt_state = snap
                if not self._demote(str(e).splitlines()[0][:200]):
                    raise

    def train(self, num_epoch: int = 1, batch_per_epoch: Optional[int] = None):
        from concurrent.futures import ThreadPoolExecutor

        profiling = False
        if self.profile_dir and not getattr(self, "_profiled", False):
            jax.profiler.start_trace(self.profile_dir)
            profiling, self._profiled = True, True
        for _ in range(num_epoch):
            self.epoch += 1
            it = self._epoch_chunks(batch_per_epoch)
            # double-buffered host pipeline: the worker assembles chunk c+1
            # and issues its device transfer while chunk c's step executes;
            # the main loop never blocks (metrics stay on device until the
            # meter's window fetch)
            with ThreadPoolExecutor(1) as ex:
                pending = ex.submit(next, it, None)
                while True:
                    item = pending.result()
                    if item is None:
                        break
                    pending = ex.submit(next, it, None)
                    gid, k, batch, sw = item
                    metrics = self._run_step(gid, batch, sw)
                    self.meter.update_many(
                        metrics, k,
                        rates={"edges_per_s": k * self._edges_per_step(gid)},
                    )
            self.meter.log_window()
            self.logger.info(f"epoch {self.epoch} done")
        if profiling:
            jax.block_until_ready(self.params)
            jax.profiler.stop_trace()
            self.logger.info(f"profiler trace -> {self.profile_dir}")

    def evaluate(self, split: str, fast_test: Optional[int] = None):
        self.logger.info(f"Evaluate on {split}")
        while True:
            try:
                metrics = self.task.evaluate(
                    self.params, split, self.batch_size, fast_test=fast_test
                )
                break
            except Exception as e:
                # eval jits don't donate, so a straight retry is safe
                if not (_is_oom_error(e) and self._demote(
                        str(e).splitlines()[0][:200])):
                    raise
        printable = {k: v for k, v in metrics.items() if not isinstance(v, dict)}
        self.meter.log_dict(printable, category=f"{split}/epoch {self.epoch}")
        return metrics

    # ------------------------------------------------------------------

    def save(self, path: str):
        ckpt_io.save_checkpoint(path, self.params, self.opt_state, self.epoch)
        self.logger.info(f"Save checkpoint to {path}")

    def load(self, path: str, fix_reasoner: bool = False, drop_optimizer: bool = True):
        self.logger.info(f"Load checkpoint from {path}")
        params, opt_state, epoch = ckpt_io.load_checkpoint(
            path, self.params, None if drop_optimizer else self.opt_state,
            fix_reasoner=fix_reasoner,
        )
        self.params = params
        if opt_state is not None:
            self.opt_state = opt_state
        if epoch is not None and not drop_optimizer:
            self.epoch = epoch
