"""Task layer: orchestration of graphs, sampling, loss and evaluation for the
three task families of the reference (/root/reference/ultra/task.py):

  * TransductiveKGTask   — KnowledgeGraphCompletion(Adapted): one graph; facts
    = train edges (optionally fact_ratio-thinned); filtered ranking against
    the full graph.
  * InductiveKGTask      — Inductive...(Adapted): per-split propagation graphs
    over disjoint entity vocabularies; eval-graph selection semantics of
    task.py:435-447; per-split relation graphs.
  * MultiGraphPretrainTask — MultiGraphPreTraining: per-graph buffers, batches
    drawn from one graph at a time, per-graph eval averaged across graphs.

All device work happens in pure jit-able functions built per (task, graph);
the classes hold host-side state (numpy triples, prebuilt Graph pytrees).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..data.datasets import InductiveDataset, JointDataset, TransductiveDataset
from ..data.graph import Graph
from ..data.relgraph import build_relation_graph
from ..models.ultra import (
    UltraConfig,
    ultra_eval_scores,
    ultra_init,
    ultra_train_scores,
)
from ..ops.match import head_truth_mask, tail_truth_mask
from ..ops.sampling import strict_negatives
from .kg import (
    bce_self_adversarial,
    cross_entropy_positive,
    evaluate_ranking,
    filtered_ranking,
    margin_ranking,
    toy_eval_ranking,
)

DEFAULT_TRANSDUCTIVE_METRICS = (
    "mr", "mrr", "hits@1", "hits@3", "hits@10",
    "mrr-tail", "hits@1-tail", "hits@10-tail",
)
DEFAULT_INDUCTIVE_METRICS = ("mr", "mrr", "hits@1", "hits@3", "hits@10", "hits@10_50")


@dataclasses.dataclass(frozen=True)
class TaskConfig:
    num_negative: int = 128
    adversarial_temperature: float = 1.0
    strict_negative: bool = True
    filtered_ranking: bool = True
    criterion: str = "bce"
    margin: float = 6.0
    metrics: Sequence[str] = DEFAULT_TRANSDUCTIVE_METRICS
    sample_weight: bool = False
    fact_ratio: Optional[float] = None
    metric_per_rel: bool = False
    toy_eval: bool = False  # 50-sampled-negative protocol (task.py:474-484)
    # eval batch: None = auto (largest power-of-two fitting the HBM budget —
    # raises small batches to amortize the per-dispatch cost, shrinks batches
    # that would OOM at large V); an int pins it (the reference always
    # evaluates at engine.batch_size)
    eval_batch_size: Optional[int] = None


def _criterion_loss(cfg: TaskConfig, scores, sample_weight=None):
    if cfg.criterion == "bce":
        return bce_self_adversarial(
            scores, cfg.adversarial_temperature, sample_weight
        )
    if cfg.criterion == "ce":
        return cross_entropy_positive(scores)
    if cfg.criterion == "ranking":
        return margin_ranking(scores, cfg.margin)
    raise ValueError(f"unknown criterion {cfg.criterion!r}")


def _degree_weights(train: np.ndarray, num_entities: int, num_relations: int):
    """sample_weight degree tables (task.py:50-57)."""
    deg_hr = np.zeros((num_entities, num_relations), np.int64)
    deg_tr = np.zeros((num_entities, num_relations), np.int64)
    np.add.at(deg_hr, (train[:, 0], train[:, 2]), 1)
    np.add.at(deg_tr, (train[:, 1], train[:, 2]), 1)
    return deg_hr, deg_tr


def _hbm_bytes() -> int:
    """Per-device HBM budget. Remote-tunnel backends expose no memory_stats;
    fall back to the v5e's 16 GB."""
    try:
        stats = jax.devices()[0].memory_stats() or {}
        limit = stats.get("bytes_limit") or stats.get("bytes_reservable_limit")
        if limit:
            return int(limit)
    except Exception:
        pass
    return 16 << 30


# fraction of HBM the saved carry stack may use: the backward's true peak is
# ~2.2x the stack (2-3 live carry copies, remat-compressed duplicates, and
# ~35% allocator fragmentation measured on the ATOMIC-scale dump,
# script/diagnostics/train_memory.py)
_MB_BUDGET_FRACTION = 0.25


def auto_micro_batch(model_cfg: UltraConfig, num_nodes: int, batch: int,
                     budget_bytes: Optional[int] = None) -> UltraConfig:
    """Pick entity-tower microbatching so the propagation carries fit HBM.

    Full remat still saves one flat [V, B*D] f32 carry per layer (the scan
    stack); when those alone exceed _MB_BUDGET_FRACTION of the device budget,
    halve the microbatch until they fit — the tower then runs as a sequential
    checkpointed lax.map over batch chunks (models/nbfnet.py micro_batch),
    gradients unchanged. Explicit micro_batch config wins.

    budget_bytes: the HBM budget to size against (defaults to the queried
    device HBM; tasks pass their fail-soft-derated budget)."""
    ent = model_cfg.entity
    if ent.micro_batch or batch <= 1:
        return model_cfg
    L = len(ent.hidden_dims)
    D = ent.input_dim
    budget = _MB_BUDGET_FRACTION * (budget_bytes or _hbm_bytes())

    def carry_bytes(b):
        return L * num_nodes * b * D * 4

    if carry_bytes(batch) <= budget:
        return model_cfg
    mb = batch
    while mb > 1 and carry_bytes(mb) > budget and batch % (mb // 2) == 0:
        mb //= 2
    if mb == batch:
        return model_cfg  # indivisible batch: nothing we can do
    return dataclasses.replace(
        model_cfg, entity=dataclasses.replace(ent, micro_batch=mb)
    )


class _TaskBase:
    """Shared machinery: loss step + all-entity eval step builders."""

    model_cfg: UltraConfig
    cfg: TaskConfig

    # -- fail-soft policy demotion (VERDICT r4 #5) ------------------------
    # The auto remat/stack/micro-batch/eval-batch policies are calibrated
    # HBM models; a misprediction used to be a hard OOM at step 0. Each
    # demotion level HALVES the budget every auto policy sizes against,
    # which walks the resolution one tier down the measured ladder
    # (full-save+unroll -> save_rspmm+scan -> full remat+scan -> halved
    # micro_batch -> ...) and shrinks the auto eval batch. The engine
    # catches RESOURCE_EXHAUSTED on step/eval execution, calls
    # demote_policy(), and retries — a 25-hour pretrain survives a chip
    # whose HBM is smaller than the calibration chip's. Explicitly pinned
    # policies are respected (only 'auto' resolution reads the budget).
    _policy_demotion = 0
    _MAX_POLICY_DEMOTION = 6

    def _budget_bytes(self) -> int:
        return int(_hbm_bytes()) >> self._policy_demotion

    def demote_policy(self, reason: str = "") -> bool:
        """Shrink the assumed HBM budget one tier and rebuild the jitted
        step/eval closures so the next trace resolves the demoted policy.
        Returns False when the ladder is exhausted."""
        if self._policy_demotion >= self._MAX_POLICY_DEMOTION:
            return False
        self._policy_demotion += 1
        import logging

        logging.getLogger(__name__).warning(
            "policy demotion -> level %d (budget %.1f GB)%s",
            self._policy_demotion, self._budget_bytes() / 2**30,
            f": {reason}" if reason else "",
        )
        self._rebuild_jits()
        return True

    def _rebuild_jits(self):
        """Recreate the jitted loss/eval closures after a demotion (they
        resolve the auto policies at trace/build time). Overridden by each
        task family; the base is a no-op for families with no cached jits."""

    def init_params(self, key):
        return ultra_init(key, self.model_cfg)

    def _uses_pallas(self) -> bool:
        # "ring" needs single-chip layouts too: off-mesh paths (edge-grad
        # scoring, max/min aggregations) fall back to the Pallas kernels
        return self.model_cfg.entity.rspmm_impl in ("pallas", "ring")

    # full-save (remat=False) backward peak, calibrated on the FB-scale
    # measurement (script/diagnostics/step_breakdown_bwd.py round 4: XLA temp
    # 8.86 GB at V=14541, B=64, D=64, 6 layers, unrolled) — ~6.2x the naive
    # per-layer carry stack (kernel pads, dual-saved activations, fragments)
    _FULL_SAVE_PEAK_FACTOR = 6.2

    # save_rspmm + scan backward peak in [V, B*D] units: L saved rspmm
    # outputs + the L-deep scan carry stack + ~4 working copies. Calibrated
    # against the WN-scale boundary (V=40943, B=64: 16 units = 10.7 GB ran
    # in-budget on a 15.75 GB chip at 691 ms/step; unroll at the same
    # policy OOMed, so save_rspmm always pairs with scan)
    _SAVE_RSPMM_PEAK_UNITS = staticmethod(lambda L: 2 * L + 4)

    def _resolve_model_cfg(self, fact_graph: Graph, batch: int = 64) -> UltraConfig:
        """remat="auto": cheapest policy that fits, measured fastest-first —
        no remat at all (backward reuses every forward intermediate; fastest,
        round-4 measured 272 vs 362 ms at FB scale) when the full-save peak
        fits the HBM budget; save_rspmm (backward skips the gather kernels)
        for small graphs; full remat above the node threshold.

        stack="auto": unrolled layer stack on TPU (no scan carry-stack
        dynamic-update-slices; XLA fuses pads/copies across layers — the
        round-4 profile showed ~60 ms of scan machinery per step), lax.scan
        elsewhere (one compiled layer body; CPU tests compile 6x faster).
        Under FULL remat the unrolled backward's recompute zones schedule
        loosely enough that XLA holds many [V, B*D] buffers live (a WN-scale
        2000-step endurance run OOMed at 16.9 GB where scan ran the same
        graph in-budget round 3) — so auto pairs unroll only with the
        save-everything policies and keeps scan when remat is full."""
        cfg = self.model_cfg
        ent, rel = cfg.entity, cfg.relation

        budget = self._budget_bytes()  # fail-soft-derated HBM budget

        def full_save_fits(tower, num_nodes):
            L = len(tower.hidden_dims)
            unit = num_nodes * batch * tower.input_dim * 4
            return self._FULL_SAVE_PEAK_FACTOR * L * unit <= 0.7 * budget

        def resolve(tower, num_nodes):
            L = len(tower.hidden_dims)
            unit = num_nodes * batch * tower.input_dim * 4
            if full_save_fits(tower, num_nodes):
                return False
            if self._SAVE_RSPMM_PEAK_UNITS(L) * unit <= 0.7 * budget:
                return "save_rspmm"
            return True

        # the relation tower propagates over the RELATION graph (2R nodes —
        # full-save always fits there)
        if ent.remat == "auto":
            ent = dataclasses.replace(
                ent, remat=resolve(ent, fact_graph.num_nodes))
        if rel.remat == "auto":
            rel = dataclasses.replace(
                rel, remat=resolve(rel, ent.num_relations))
        if ent.stack == "auto" or rel.stack == "auto":
            on_tpu = jax.default_backend() == "tpu"

            def pick(tower, num_nodes):
                # unroll ONLY when saving everything fits at this scale:
                # the unrolled graph's loose scheduling lets XLA hold many
                # [V, B*D] buffers live — measured OOMs: WN-scale training
                # under full remat AND save_rspmm (16.9 GB), ATOMIC-scale
                # forward-only eval with pinned remat=False (17.5 GB,
                # 3.4 GB of it fragmentation). scan bounds the live set.
                return (
                    "unroll"
                    if on_tpu and tower.remat in (False, "none")
                    and full_save_fits(tower, num_nodes)
                    else "scan"
                )

            if ent.stack == "auto":
                ent = dataclasses.replace(
                    ent, stack=pick(ent, fact_graph.num_nodes))
            if rel.stack == "auto":
                rel = dataclasses.replace(
                    rel, stack=pick(rel, ent.num_relations))
        if ent is cfg.entity and rel is cfg.relation:
            return cfg
        return dataclasses.replace(cfg, entity=ent, relation=rel)

    # scoring hooks — ULTRA by default; ClassicNBFNet tasks override these
    def _train_scores(self, params, fact_graph, rel_graph, h, t, r, neg,
                      fact_und, model_cfg=None):
        return ultra_train_scores(
            params, model_cfg or self.model_cfg, fact_graph, rel_graph,
            h, t, r, neg, fact_graph_und=fact_und,
        )

    def _eval_scores(self, params, fact_graph, rel_graph, h, t, r, fact_und,
                     model_cfg=None):
        return ultra_eval_scores(
            params, model_cfg or self.model_cfg, fact_graph, rel_graph, h, t, r,
            fact_graph_und=fact_und,
        )

    def _prepare_graphs(self, fact_graph: Graph, rel_graph: Graph):
        """Precompute the undirected propagation graph (and, on TPU, the CSR
        layouts the Pallas kernels consume) once per fact graph."""
        und = fact_graph.undirected_with_inverse()
        # dense-enough relation graphs take the MXU matmul path (no-op for
        # large/sparse graphs — see Graph.prepare_dense)
        rel_graph = rel_graph.prepare_dense()
        if self._uses_pallas():
            transe = (self.model_cfg.entity.message_func == "transe"
                      or self.model_cfg.relation.message_func == "transe")

            def ilv(tower):
                # extremum-issuing aggregations take the run-interleaved
                # blocked layouts: the interleaved extremum bodies measured
                # -18% fwd and make the single-pass blocked argext backward
                # the winner (max fwd+bwd 39.8 vs 55.0 ms at the bench
                # shape; pairs -22%). sum/mean keep contiguous (ILV measured
                # +4% there). pna's 4-plane pair backward only stays
                # single-pass with 256-row streamed g blocks.
                base = tower.aggregate_func.replace("_nobound", "")
                if base == "pna":
                    return dict(interleave=8, bwd_block_rows=256)
                if base in ("max", "min"):
                    return dict(interleave=8)
                return {}

            und = und.prepare_pallas(
                include_rel_layout=transe, **ilv(self.model_cfg.entity),
            )
            rel_graph = rel_graph.prepare_pallas(
                include_rel_layout=transe, **ilv(self.model_cfg.relation),
            )
            edge_axis = self.model_cfg.entity.edge_axis
            if edge_axis:
                from ..parallel.mesh import current_mesh

                mesh = current_mesh()
                if mesh is not None and edge_axis in mesh.axis_names:
                    n = mesh.shape[edge_axis]
                    if self.model_cfg.entity.rspmm_impl == "ring":
                        # row-sharded O(V/n) path; per-bucket Pallas layouts
                        # only exist for msg='mul' (distmult). permuted_io:
                        # the entity tower carries block-domain states for
                        # the whole stack (degree-balanced for free when the
                        # contiguous split is hub-imbalanced)
                        und = und.prepare_ring(
                            n,
                            pallas=self.model_cfg.entity.message_func
                            == "distmult",
                            balance="auto",
                            permuted_io=True,
                        )
                    else:
                        und = und.prepare_pallas_sharded(
                            n, include_rel_layout=transe
                        )
                    if self.model_cfg.relation.edge_axis:
                        if self.model_cfg.relation.rspmm_impl == "ring":
                            rel_graph = rel_graph.prepare_ring(
                                n,
                                pallas=self.model_cfg.relation.message_func
                                == "distmult",
                            )
                        else:
                            rel_graph = rel_graph.prepare_pallas_sharded(
                                n, include_rel_layout=transe
                            )
        return und, rel_graph

    # -- builders ----------------------------------------------------------

    def _build_loss_fn(self, fact_graph: Graph, rel_graph: Graph, num_nodes: int):
        cfg = self.cfg
        # pre-sorted edge index: the per-step easy-edge mask joins via binary
        # search instead of re-sorting E+P rows inside every train step
        fact_graph = fact_graph.prepare_join(
            one_hop=getattr(self.model_cfg, "remove_one_hop", False)
        )
        fact_und, rel_graph = self._prepare_graphs(fact_graph, rel_graph)

        def loss_fn(params, key, batch, sample_weight=None):
            # batch size is static at trace time: resolve the remat policy
            # (full-save fit depends on B) and size the entity-tower
            # microbatching to the device budget here
            mcfg = self._resolve_model_cfg(fact_graph, int(batch.shape[0]))
            mcfg = auto_micro_batch(mcfg, fact_graph.num_nodes,
                                    int(batch.shape[0]),
                                    budget_bytes=self._budget_bytes())
            h, t, r = batch[:, 0], batch[:, 1], batch[:, 2]
            if cfg.strict_negative:
                neg = strict_negatives(
                    key, fact_graph.edge_list, h, t, r, num_nodes, cfg.num_negative
                )
            else:
                neg = jax.random.randint(
                    key, (batch.shape[0], cfg.num_negative), 0, num_nodes
                )
            scores = self._train_scores(
                params, fact_graph, rel_graph, h, t, r, neg, fact_und,
                model_cfg=mcfg,
            )
            loss = _criterion_loss(cfg, scores, sample_weight)
            metrics = {
                "loss": loss,
                "pos_score": scores[:, 0].mean(),
                "neg_score": scores[:, 1:].mean(),
            }
            return loss, metrics

        return loss_fn

    def _build_eval_fn(self, fact_graph: Graph, rel_graph: Graph, filter_graph: Graph):
        """Returns fn(params, batch[B,3]) ->
        (ranking [B,2] int32, num_candidates [B,2] float32)."""
        cfg = self.cfg
        V = fact_graph.num_nodes
        model_cfg = self._resolve_model_cfg(fact_graph)
        fact_und, rel_graph = self._prepare_graphs(fact_graph, rel_graph)

        def eval_fn(params, batch, key=None):
            h, t, r = batch[:, 0], batch[:, 1], batch[:, 2]
            t_scores, h_scores = self._eval_scores(
                params, fact_graph, rel_graph, h, t, r, fact_und,
                model_cfg=model_cfg,
            )
            t_truth = tail_truth_mask(filter_graph.edge_list, h, r, V)
            h_truth = head_truth_mask(filter_graph.edge_list, t, r, V)
            if cfg.toy_eval:
                kt, kh = jax.random.split(key)
                t_pos = jnp.take_along_axis(t_scores, t[:, None], axis=1)
                h_pos = jnp.take_along_axis(h_scores, h[:, None], axis=1)
                t_rank = toy_eval_ranking(kt, t_pos, t_scores, ~t_truth)
                h_rank = toy_eval_ranking(kh, h_pos, h_scores, ~h_truth)
                # optimistic/pessimistic AVERAGE ranks are x.5 on score ties
                # and stay float in the reference (task.py:483-484) — int
                # truncation would bias MR low / MRR high
                ranking = jnp.stack([t_rank, h_rank], axis=1).astype(jnp.float32)
                # sampled protocol: 50 negatives + positive (task.py:499-501)
                num_cand = jnp.full(ranking.shape, 51.0, jnp.float32)
                return ranking, num_cand
            t_rank = filtered_ranking(t_scores, t, t_truth, cfg.filtered_ranking)
            h_rank = filtered_ranking(h_scores, h, h_truth, cfg.filtered_ranking)
            ranking = jnp.stack([t_rank, h_rank], axis=1)
            num_cand = jnp.stack(
                [(~t_truth).sum(-1), (~h_truth).sum(-1)], axis=1
            ).astype(jnp.float32)
            return ranking, num_cand

        return eval_fn

    # eval HBM model, calibrated on the ATOMIC-scale measurement
    # (script/diagnostics/eval_memory.py: XLA temp 7.49 GB at V=304388, B=16,
    # D=64 -> ~6 f32 copies of the flat [V, B*D] propagation state)
    _EVAL_STATE_COPIES = 6.0
    _EVAL_BATCH_RAISE_CAP = 128  # never auto-raise past this

    def _resolve_eval_batch(self, requested: int, num_nodes: int) -> int:
        """Auto eval batch sizing (the training analog is auto_micro_batch):
        eval is propagate-once forward-only, so its live set is a few flat
        [V, B*D] states — pick the largest power-of-two batch that fits the
        HBM budget. Replaces the reference's manual full_batch_eval /
        CPU-offload escape hatches (ref task.py:262-263,600-618) with a
        measured policy; cfg.eval_batch_size pins it explicitly."""
        if self.cfg.eval_batch_size:
            return int(self.cfg.eval_batch_size)
        D = self.model_cfg.entity.input_dim
        per_b = self._EVAL_STATE_COPIES * num_nodes * D * 4
        fit = max(1, int(0.75 * self._budget_bytes() / per_b))
        cap = min(fit, max(requested, self._EVAL_BATCH_RAISE_CAP))
        b = 1
        while b * 2 <= cap:
            b *= 2
        return b

    # -- host-side eval loop ----------------------------------------------

    def _run_eval(self, eval_fn, params, triples: np.ndarray, batch_size: int):
        """Pad-to-batch eval loop; returns (ranking, num_cand) numpy [N,2].
        Under multi-host execution each process scores a round-robin shard and
        results are all-gathered (the reference's DistributedSampler +
        comm.cat, engine.py:130,148-150)."""
        from ..parallel import distributed as dist

        total = len(triples)
        triples = dist.shard_eval_triples(triples)
        n = len(triples)
        # single-process multi-device: shard the eval batch over the mesh's
        # data axis (scoring is per-triple; XLA propagates the sharding) —
        # multi-HOST sharding is the round-robin split above
        batch_sharding = None
        from ..parallel.mesh import current_mesh

        mesh = current_mesh()
        if mesh is not None and mesh.shape.get("data", 1) > 1 \
                and batch_size % mesh.shape["data"] == 0 \
                and jax.process_count() == 1:
            # multi-HOST runs already shard triples round-robin above —
            # device_put over a global mesh there would interleave the
            # hosts' DIFFERENT chunks into one garbled global batch
            from jax.sharding import NamedSharding, PartitionSpec as P

            batch_sharding = NamedSharding(mesh, P("data"))
        rankings, cands = [], []
        for start in range(0, n, batch_size):
            chunk = triples[start : start + batch_size]
            pad = batch_size - len(chunk)
            if pad:
                chunk = np.concatenate([chunk, np.repeat(chunk[:1], pad, 0)], 0)
            key = jax.random.fold_in(jax.random.PRNGKey(1024), start)
            if batch_sharding is not None:
                # one transfer straight to the sharded layout (a jnp.asarray
                # first would commit to device 0 and reshard = two hops)
                chunk = jax.device_put(chunk, batch_sharding)
            else:
                chunk = jnp.asarray(chunk)
            ranking, num_cand = eval_fn(params, chunk, key)
            # keep results on device: fetching here would block the host on
            # every batch and stall dispatch of the next one (per-batch
            # round trips are 15-40 ms over the remote-TPU tunnel); the
            # whole split's rankings are fetched in ONE device_get below
            rankings.append((ranking, batch_size - pad))
            cands.append(num_cand)
        fetched = jax.device_get([r for r, _ in rankings] + cands)
        ranking = (
            np.concatenate(
                [np.asarray(r)[:keep] for r, (_, keep) in
                 zip(fetched[: len(rankings)], rankings)], 0)
            if rankings else np.zeros((0, 2), np.int32)
        )
        cand = (
            np.concatenate(
                [np.asarray(cb)[:keep] for cb, (_, keep) in
                 zip(fetched[len(rankings):], rankings)], 0)
            if cands else np.zeros((0, 2), np.float32)
        )
        return (dist.gather_rankings(ranking, total),
                dist.gather_rankings(cand, total))

    def _metrics_from_rankings(
        self, ranking: np.ndarray, num_cand: np.ndarray, rel: Optional[np.ndarray]
    ) -> Dict[str, float]:
        kwargs = {}
        if self.cfg.metric_per_rel and rel is not None:
            kwargs = dict(
                rel_index=jnp.asarray(rel),
                num_relations=self.num_relations * 2,
            )
        m = evaluate_ranking(
            jnp.asarray(ranking),
            self.cfg.metrics,
            num_candidates=jnp.asarray(num_cand),
            **kwargs,
        )
        return {k: float(v) for k, v in m.items()}


# ---------------------------------------------------------------------------


class TransductiveKGTask(_TaskBase):
    def __init__(
        self,
        dataset: TransductiveDataset,
        model_cfg: UltraConfig,
        cfg: TaskConfig = TaskConfig(),
        seed: int = 0,
    ):
        self.dataset = dataset
        self.model_cfg = model_cfg
        self.cfg = cfg
        self.num_relations = dataset.num_relations
        self.fact_graph, self.train_triples = dataset.fact_graph(
            cfg.fact_ratio, seed=seed
        )
        self.rel_graph = build_relation_graph(self.fact_graph)
        self.graph = dataset.graph  # filter graph
        if cfg.sample_weight:
            self.deg_hr, self.deg_tr = _degree_weights(
                self.train_triples, dataset.num_entities, dataset.num_relations
            )
        self._rebuild_jits()

    def _rebuild_jits(self):
        self._loss_fn = jax.jit(
            self._build_loss_fn(
                self.fact_graph, self.rel_graph, self.dataset.num_entities
            )
        )
        self._eval_fn = jax.jit(
            self._build_eval_fn(self.fact_graph, self.rel_graph, self.graph)
        )

    def sample_weight_for(self, batch: np.ndarray):
        if not self.cfg.sample_weight:
            return None
        w = (
            self.deg_hr[batch[:, 0], batch[:, 2]]
            * self.deg_tr[batch[:, 1], batch[:, 2]]
        )
        return jnp.asarray(1.0 / np.sqrt(np.maximum(w, 1)), jnp.float32)

    def loss_step(self, params, key, batch: np.ndarray):
        return self._loss_fn(
            params, key, jnp.asarray(batch), self.sample_weight_for(batch)
        )

    def eval_triples(self, split: str) -> np.ndarray:
        return {"valid": self.dataset.valid, "test": self.dataset.test}[split]

    def evaluate(self, params, split: str, batch_size: int, fast_test=None):
        triples = self.eval_triples(split)
        if fast_test:
            g = np.random.default_rng(1024)
            triples = triples[g.permutation(len(triples))[:fast_test]]
        batch_size = self._resolve_eval_batch(
            batch_size, self.fact_graph.num_nodes
        )
        ranking, cand = self._run_eval(self._eval_fn, params, triples, batch_size)
        rel = np.stack([triples[:, 2], triples[:, 2] + self.num_relations], 1)
        return self._metrics_from_rankings(ranking, cand, rel)


# ---------------------------------------------------------------------------


class InductiveKGTask(_TaskBase):
    def __init__(
        self,
        dataset: InductiveDataset,
        model_cfg: UltraConfig,
        cfg: TaskConfig = dataclasses.replace(
            TaskConfig(), metrics=DEFAULT_INDUCTIVE_METRICS
        ),
    ):
        self.dataset = dataset
        self.model_cfg = model_cfg
        self.cfg = cfg
        self.num_relations = dataset.num_relations
        self.train_triples = dataset.train

        self.graphs = {
            "train": dataset.train_graph,
            "valid": dataset.valid_graph,
            "test": dataset.test_graph,
        }
        self.rel_graphs = {
            split: build_relation_graph(g) for split, g in self.graphs.items()
        }
        # eval filter-graph selection (task.py:435-447): valid uses the
        # transductive filter graph iff the valid propagation graph is the
        # train graph (use_inductive_valid = no)
        # identity short-circuit (the GraIL loaders reuse one object), then
        # compare HOST edge caches — np.asarray(edge_list) would read the
        # full device arrays back over the tunnel (~100s at WN18RR scale)
        valid_is_train = dataset.valid_graph is dataset.train_graph or (
            dataset.valid_graph.num_edges == dataset.train_graph.num_edges
            and bool(
                np.array_equal(
                    dataset.valid_graph.host_edge_index(),
                    dataset.train_graph.host_edge_index(),
                )
            )
            and bool(
                np.array_equal(
                    dataset.valid_graph.host_edge_type(),
                    dataset.train_graph.host_edge_type(),
                )
            )
        )
        self.filter_graphs = {
            "train": dataset.graph,
            "valid": dataset.graph if valid_is_train else dataset.inductive_graph,
            "test": dataset.inductive_graph,
        }
        if cfg.sample_weight:
            self.deg_hr, self.deg_tr = _degree_weights(
                dataset.train, dataset.train_graph.num_nodes, dataset.num_relations
            )
        self._rebuild_jits()

    def _rebuild_jits(self):
        self._loss_fn = jax.jit(
            self._build_loss_fn(
                self.dataset.train_graph,
                self.rel_graphs["train"],
                self.dataset.train_graph.num_nodes,
            )
        )
        self._eval_fns = {
            split: jax.jit(
                self._build_eval_fn(
                    self.graphs[split], self.rel_graphs[split],
                    self.filter_graphs[split],
                )
            )
            for split in ("valid", "test")
        }

    def sample_weight_for(self, batch: np.ndarray):
        if not self.cfg.sample_weight:
            return None
        w = (
            self.deg_hr[batch[:, 0], batch[:, 2]]
            * self.deg_tr[batch[:, 1], batch[:, 2]]
        )
        return jnp.asarray(1.0 / np.sqrt(np.maximum(w, 1)), jnp.float32)

    def loss_step(self, params, key, batch: np.ndarray):
        return self._loss_fn(
            params, key, jnp.asarray(batch), self.sample_weight_for(batch)
        )

    def eval_triples(self, split: str) -> np.ndarray:
        return {"valid": self.dataset.valid, "test": self.dataset.test}[split]

    def evaluate(self, params, split: str, batch_size: int, fast_test=None):
        triples = self.eval_triples(split)
        if fast_test:
            g = np.random.default_rng(1024)
            triples = triples[g.permutation(len(triples))[:fast_test]]
        ranking, cand = self._run_eval(
            self._eval_fns[split], params, triples,
            self._resolve_eval_batch(batch_size, self.graphs[split].num_nodes),
        )
        # inductive per-relation uses the base relation id for both directions
        # (task.py:456-458)
        rel = np.stack([triples[:, 2], triples[:, 2]], 1)
        return self._metrics_from_rankings(ranking, cand, rel)


# ---------------------------------------------------------------------------


class MultiGraphPretrainTask(_TaskBase):
    def __init__(
        self,
        dataset: JointDataset,
        model_cfg: UltraConfig,
        cfg: TaskConfig = dataclasses.replace(
            TaskConfig(), metrics=("mr", "mrr", "hits@1", "hits@3", "hits@10")
        ),
    ):
        self.dataset = dataset
        self.model_cfg = model_cfg
        self.cfg = cfg
        self.graphs: List[Graph] = []  # full graphs (filtering)
        self.fact_graphs: List[Graph] = []  # train-edge graphs (propagation)
        self.rel_graphs: List[Graph] = []
        self.train_triples: List[np.ndarray] = []
        for ds in dataset.datasets:
            fact, train = ds.fact_graph(None)
            self.graphs.append(ds.graph)
            self.fact_graphs.append(fact)
            self.rel_graphs.append(build_relation_graph(fact))
            self.train_triples.append(train)
        self.num_graphs = len(self.graphs)
        self.num_relations = max(g.num_relations for g in self.graphs)
        # edge-count mixture weights, fixed at construction (engine.py:23-28)
        probs = np.array([g.num_edges for g in self.fact_graphs], np.float64)
        self._graph_probs = probs / probs.sum()
        self._loss_fns = {}
        self._eval_fns = {}

    def _rebuild_jits(self):
        # per-graph jits are built lazily — dropping the caches is enough
        self._loss_fns = {}
        self._eval_fns = {}

    # edge-count-weighted graph choice (engine.py:23-28)
    def sample_graph_id(self, rng: np.random.Generator) -> int:
        return int(rng.choice(self.num_graphs, p=self._graph_probs))

    def ensure_loss_fn(self, graph_id: int):
        """Build (without executing) the per-graph loss fn; callers that
        inline it into a larger jit (the engine's fused step) use this so the
        standalone executable is never compiled — over the remote tunnel a
        throwaway Mosaic compile costs minutes per pretrain graph."""
        if graph_id not in self._loss_fns:
            self._loss_fns[graph_id] = jax.jit(
                self._build_loss_fn(
                    self.fact_graphs[graph_id],
                    self.rel_graphs[graph_id],
                    self.fact_graphs[graph_id].num_nodes,
                )
            )
        return self._loss_fns[graph_id]

    def loss_step(self, params, key, batch: np.ndarray, graph_id: int):
        return self.ensure_loss_fn(graph_id)(
            params, key, jnp.asarray(batch), None
        )

    def eval_sets(self, split: str):
        """[(graph_name, graph_id, triples)] for the given split."""
        out = []
        for gid, ds in enumerate(self.dataset.datasets):
            triples = {"valid": ds.valid, "test": ds.test}[split]
            out.append((ds.name, gid, triples))
        return out

    def evaluate(self, params, split: str, batch_size: int, fast_test=None):
        all_metrics = []
        per_graph = {}
        for name, gid, triples in self.eval_sets(split):
            if fast_test:
                g = np.random.default_rng(1024)
                triples = triples[g.permutation(len(triples))[:fast_test]]
            if gid not in self._eval_fns:
                self._eval_fns[gid] = jax.jit(
                    self._build_eval_fn(
                        self.fact_graphs[gid], self.rel_graphs[gid], self.graphs[gid]
                    )
                )
            ranking, cand = self._run_eval(
                self._eval_fns[gid], params, triples,
                self._resolve_eval_batch(
                    batch_size, self.fact_graphs[gid].num_nodes
                ),
            )
            m = self._metrics_from_rankings(ranking, cand, None)
            per_graph[name] = m
            all_metrics.append(m)
        avg = {
            k: float(np.mean([m[k] for m in all_metrics])) for k in all_metrics[0]
        }
        avg["per_graph"] = per_graph
        return avg


# ---------------------------------------------------------------------------


class ClassicNBFNetTask(TransductiveKGTask):
    """Transductive KG completion with the classic NBFNet reasoner (learned
    query embeddings, no relation tower) — the reference's
    KnowledgeGraphCompletionBase + models.NBFNet pairing
    (/root/reference/ultra/task.py:22-195 + model.py:198-392).

    model_cfg here is an NBFNetConfig (from models.classic_nbfnet); the
    relation graph is unused.
    """

    def __init__(self, dataset, nbf_cfg, cfg: TaskConfig = TaskConfig(),
                 seed: int = 0):
        from ..models.classic_nbfnet import classic_nbfnet_init

        self.nbf_cfg = nbf_cfg
        self._nbf_init = classic_nbfnet_init
        # reuse the base wiring with a wrapper model_cfg carrying entity=nbf
        wrapper = UltraConfig(entity=nbf_cfg, relation=nbf_cfg)
        super().__init__(dataset, wrapper, cfg, seed=seed)

    def init_params(self, key):
        return self._nbf_init(key, self.nbf_cfg)

    def _prepare_graphs(self, fact_graph, rel_graph):
        und = fact_graph.undirected_with_inverse()
        if self.nbf_cfg.rspmm_impl == "pallas":
            base = self.nbf_cfg.aggregate_func.replace("_nobound", "")
            kw = ({"interleave": 8, "bwd_block_rows": 256} if base == "pna"
                  else {"interleave": 8} if base in ("max", "min") else {})
            und = und.prepare_pallas(**kw)
        return und, rel_graph

    def _train_scores(self, params, fact_graph, rel_graph, h, t, r, neg,
                      fact_und, model_cfg=None):
        from ..models.classic_nbfnet import classic_score_all
        from ..models.ultra import _flip_heads_to_tails, _mask_easy_edges

        B, N = h.shape[0], neg.shape[1]
        half = B // 2
        ar = jnp.arange(B)
        h_index = jnp.broadcast_to(h[:, None], (B, N + 1))
        t_index = jnp.broadcast_to(t[:, None], (B, N + 1))
        r_index = jnp.broadcast_to(r[:, None], (B, N + 1))
        row_is_tail = (ar < half)[:, None]
        later = (jnp.arange(N + 1) >= 1)[None, :]
        t_index = jnp.where(row_is_tail & later,
                            jnp.concatenate([t[:, None], neg], 1), t_index)
        h_index = jnp.where((~row_is_tail) & later,
                            jnp.concatenate([h[:, None], neg], 1), h_index)
        graph = _mask_easy_edges(self.model_cfg, fact_graph, h_index, t_index,
                                 r_index)
        graph_und = fact_und.with_edge_weight(
            jnp.concatenate([graph.edge_weight, graph.edge_weight])
        )
        h_index, t_index, r_index = _flip_heads_to_tails(
            h_index, t_index, r_index, fact_graph.num_relations
        )
        scores_all = classic_score_all(
            params, self.nbf_cfg, graph_und, h_index[:, 0], r_index[:, 0]
        )
        return jnp.take_along_axis(scores_all, t_index, axis=1)

    def _eval_scores(self, params, fact_graph, rel_graph, h, t, r, fact_und,
                     model_cfg=None):
        from ..models.classic_nbfnet import classic_score_all

        t_scores = classic_score_all(params, self.nbf_cfg, fact_und, h, r)
        h_scores = classic_score_all(
            params, self.nbf_cfg, fact_und, t, r + fact_graph.num_relations
        )
        return t_scores, h_scores
