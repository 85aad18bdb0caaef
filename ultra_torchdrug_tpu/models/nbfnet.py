"""Bellman–Ford style NBFNet propagation modules.

Two towers, mirroring the reference's architecture:

  * rel_nbfnet_*    — query-conditioned GNN over the relation graph
    (CustomNBFNetFull wrapped by RelNBFNet, /root/reference/ultra/rel_model.py:343-416):
    boundary = one-hot at the query relation, all-ones query, 6 conv layers
    with learned 4-type relation embeddings, sum aggregation, layer norm,
    short-cut. Output: per-batch vectors for every relation node [B, 2R, D].

  * entity_nbfnet_* — entity-graph reasoner with injected relation
    representations (TransferNBFNet, /root/reference/ultra/model.py:17-194):
    boundary = query vector scattered at the source entity, 6 conv layers in
    "injected+project" mode, final [state ; query] -> MLP -> scalar score.

TPU design notes: propagation state is carried FLAT [V, B*D] with static
shapes — a [V, B, 64] f32 array pads its minor dim to 128 lanes (T(8,128)
tiling), doubling every carry/remat/boundary buffer; the flat layout is
exactly lane-sized and is the rspmm kernels' native input. Scoring computes
all-entity scores in one fused pass (the reference loops over candidate
chunks and memoizes propagation with @utils.cached — here the
propagation/scoring split makes that explicit and chunk-free).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ..nn.core import mlp_apply, mlp_init
from .layers import ConvConfig, conv_apply, conv_init, ring_block_domain


# ---------------------------------------------------------------------------
# generic stacked-conv propagation
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class NBFNetConfig:
    input_dim: int
    hidden_dims: Sequence[int]
    num_relations: int  # relation vocab of the *propagation* graph
    message_func: str = "distmult"
    aggregate_func: str = "sum"
    short_cut: bool = True
    layer_norm: bool = True
    activation: str = "relu"
    concat_hidden: bool = False
    num_mlp_layer: int = 2
    rel_mode: str = "injected"
    project: bool = True
    rspmm_impl: str = "xla"
    edge_axis: str = ""
    ring_exchange: str = "ppermute"  # | rdma (Pallas remote-DMA prototype)
    learn_query: bool = False  # rel tower: learned query vector vs all-ones
    # rematerialization of the layer stack in the backward pass:
    #   False / "none"  — save everything (fastest, most memory)
    #   True / "full"   — save only layer inputs, recompute all internals
    #   "save_rspmm"    — additionally save the rspmm outputs, so the
    #                     backward recomputes only cheap elementwise work
    #                     (+1x [V,B,D] saved per layer, -1 kernel pass)
    remat: object = False
    compute_dtype: str = "float32"  # pallas message math dtype (bf16 opt-in)
    # layer-stack compilation: "scan" compiles ONE layer body (lax.scan over
    # stacked params — fastest to compile), "unroll" inlines the layers (no
    # carry-stack dynamic-update-slices, XLA fuses pads/copies across layer
    # boundaries — measured faster per step on TPU; Mosaic kernels are
    # shape-identical across layers so they compile once either way),
    # "auto" = the task layer resolves to unroll on TPU / scan elsewhere
    # (unresolved "auto" behaves like "scan")
    stack: str = "auto"
    # all-entity scoring tail: 0 = one [V, B, 2D] feature + MLP pass; N > 0 =
    # sequential lax.map over N-row entity chunks, bounding the scoring
    # intermediates to [N, B, *] (the reference's candidate chunking,
    # /root/reference/ultra/task.py:602-618, re-expressed for a
    # propagate-once-score-all design). Large-graph escape hatch
    # (ATOMIC/ConceptNet-scale V); no effect on results.
    score_chunk: int = 0
    # batch microbatching of the whole entity tower: M > 0 runs score_all as
    # a sequential lax.map over checkpointed M-element batch chunks, so peak
    # HBM is ONE chunk's propagation working set (carries are [V, M*D]) and
    # the backward recomputes chunk by chunk. Gradients are mathematically
    # identical (per-row losses). This is how ATOMIC-scale (V=304k) training
    # at batch 64 fits a 16 GB chip: 6 saved [V, 64*64] f32 carries alone are
    # 30 GB. The reference's analog is CPU offload + candidate chunking
    # (task.py:262-263); sequential in-jit microbatching is the TPU answer.
    micro_batch: int = 0

    def layer_configs(self):
        dims = [self.input_dim] + list(self.hidden_dims)
        return [
            ConvConfig(
                input_dim=dims[i],
                output_dim=dims[i + 1],
                num_relations=self.num_relations,
                query_input_dim=self.input_dim,
                message_func=self.message_func,
                aggregate_func=self.aggregate_func,
                layer_norm=self.layer_norm,
                activation=self.activation,
                rel_mode=self.rel_mode,
                project=self.project,
                rspmm_impl=self.rspmm_impl,
                edge_axis=self.edge_axis,
                compute_dtype=self.compute_dtype,
                ring_exchange=self.ring_exchange,
            )
            for i in range(len(dims) - 1)
        ]


def _maybe_remat(fn, remat, static_argnums=()):
    if not remat or remat == "none":
        return fn
    if remat == "save_rspmm":
        policy = jax.checkpoint_policies.save_only_these_names("rspmm_out")
        return jax.checkpoint(fn, policy=policy, static_argnums=static_argnums)
    return jax.checkpoint(fn, static_argnums=static_argnums)


def _scannable(layer_params, layer_cfgs, cfg: NBFNetConfig) -> bool:
    """All layers identical in config and parameter shapes, no concat_hidden:
    the stack can run as one lax.scan over stacked parameters, so XLA compiles
    ONE layer body (and one set of Pallas kernels) instead of num_layers."""
    if cfg.concat_hidden or len(layer_cfgs) < 2:
        return False
    if any(lc != layer_cfgs[0] for lc in layer_cfgs[1:]):
        return False
    shapes = [
        [leaf.shape for leaf in jax.tree_util.tree_leaves(p)] for p in layer_params
    ]
    return all(s == shapes[0] for s in shapes[1:])


def _propagate(
    layer_params,
    layer_cfgs,
    graph,
    boundary,
    cfg: NBFNetConfig,
    query=None,
    rel_injected=None,
    edge_grad: bool = False,
    block_domain: bool = False,
):
    """Run the conv stack from the boundary condition; returns the final
    hidden state (or concat of all hiddens if concat_hidden).

    Everything is FLAT [V, B*D]: boundary comes in flat, every carry, remat
    save, and rspmm in/out stays flat, and the result goes back flat. A
    [*, B, 64] tensor pads its 64-wide minor dim to 128 lanes on TPU (2x the
    bytes, the round-2 ATOMIC OOM); the flat layout is exactly lane-sized."""
    B = boundary.shape[1] // cfg.input_dim
    if cfg.stack != "unroll" and _scannable(layer_params, layer_cfgs, cfg):
        stacked = jax.tree_util.tree_map(
            lambda *leaves: jnp.stack(leaves), *layer_params
        )
        lcfg = layer_cfgs[0]

        def body(x_flat, p):
            h = conv_apply(
                p, lcfg, graph, x_flat, boundary,
                query=query, rel_injected=rel_injected, edge_grad=edge_grad,
                block_domain=block_domain,
            )
            if cfg.short_cut and h.shape == x_flat.shape:
                h = h + x_flat
            return h, None

        body = _maybe_remat(body, cfg.remat)
        out, _ = jax.lax.scan(body, boundary, stacked)
        return out
    hiddens = []
    x = boundary

    def one_layer(p, lcfg, x):
        h = conv_apply(
            p, lcfg, graph, x, boundary,
            query=query, rel_injected=rel_injected, edge_grad=edge_grad,
            block_domain=block_domain,
        )
        if cfg.short_cut and h.shape == x.shape:
            h = h + x
        return h

    if cfg.remat and not edge_grad:
        one_layer = _maybe_remat(one_layer, cfg.remat, static_argnums=(1,))
    for p, lcfg in zip(layer_params, layer_cfgs):
        h = one_layer(p, lcfg, x)
        hiddens.append(h)
        x = h
    if cfg.concat_hidden:
        # flat concat must interleave per batch element: concat the [V, B, *]
        # views, then flatten back
        V = boundary.shape[0]
        return jnp.concatenate(
            [h.reshape(V, B, -1) for h in hiddens], axis=-1
        ).reshape(V, -1)
    return hiddens[-1]


# ---------------------------------------------------------------------------
# relation-graph tower (RelNBFNet)
# ---------------------------------------------------------------------------


def rel_nbfnet_config(
    input_dim: int = 64, hidden: int = 64, num_layers: int = 6,
    rspmm_impl: str = "xla", edge_axis: str = "", learn_query: bool = False,
    remat: bool = False, compute_dtype: str = "float32", stack: str = "auto",
    ring_exchange: str = "ppermute",
) -> NBFNetConfig:
    """The fixed architecture RelNBFNet instantiates (rel_model.py:392-400):
    sum aggregation, layer_norm, short_cut, 4 relation types, distmult."""
    return NBFNetConfig(
        input_dim=input_dim,
        hidden_dims=[hidden] * num_layers,
        num_relations=4,
        message_func="distmult",
        aggregate_func="sum",
        short_cut=True,
        layer_norm=True,
        rel_mode="embedding",
        project=False,
        rspmm_impl=rspmm_impl,
        edge_axis=edge_axis,
        learn_query=learn_query,
        remat=remat,
        compute_dtype=compute_dtype,
        stack=stack,
        ring_exchange=ring_exchange,
    )


def rel_nbfnet_init(key, cfg: NBFNetConfig) -> dict:
    lcfgs = cfg.layer_configs()
    keys = jax.random.split(key, len(lcfgs) + 1)
    params = {"layers": [conv_init(k, c) for k, c in zip(keys[:-1], lcfgs)]}
    if cfg.learn_query:
        # CustomNBFNetFull(learn_query=True): Embedding(1, D) broadcast as the
        # query vector (rel_model.py:345-355)
        params["learnable_q"] = {
            "weight": jax.random.normal(keys[-1], (1, cfg.input_dim), jnp.float32)
        }
    return params


def rel_nbfnet_apply(params, cfg: NBFNetConfig, rel_graph, query_rels) -> jnp.ndarray:
    """query_rels: int [B] — the query relation per batch element.
    Returns [B, num_rel_nodes, D] conditional relation representations
    (CustomNBFNetFull.bellmanford output, rel_model.py:351-378)."""
    B = query_rels.shape[0]
    D = cfg.input_dim
    V = rel_graph.num_nodes
    # query = all-ones (input_type="ones") or a learned vector, scattered at
    # the query relation node
    if cfg.learn_query:
        query = jnp.broadcast_to(params["learnable_q"]["weight"], (B, D))
    else:
        query = jnp.ones((B, D), jnp.float32)
    boundary = _flat_boundary(V, B, D, query_rels, query)
    out = _propagate(params["layers"], cfg.layer_configs(), rel_graph, boundary, cfg)
    return out.reshape(V, B, -1).transpose(1, 0, 2)  # [B, V(=2R), D]


def rel_nbfnet_apply_shared(params, cfg: NBFNetConfig, rel_graph, query_rels) -> jnp.ndarray:
    """CustomNBFNet variant (rel_model.py:227-339): ALL query relations of the
    batch are labeled in a single graph channel; the output [2R, D] is shared
    across the batch (no per-query conditioning). boundary[r] = 1 for every
    r in query_rels (set, not add — rel_model.py:276)."""
    D = cfg.input_dim
    V = rel_graph.num_nodes
    boundary = jnp.zeros((V, D), jnp.float32)  # flat [V, 1*D]
    boundary = boundary.at[query_rels].set(1.0)
    out = _propagate(params["layers"], cfg.layer_configs(), rel_graph, boundary, cfg)
    return out  # [V(=2R), D]


def _flat_boundary(V, B, D, rows, query):
    """Flat [V, B*D] boundary with query[b] scattered at (rows[b], b). Built
    through a [V*B, D] scatter whose row-major order equals the flat layout,
    so no [V, B, D] lane-padded buffer is ever stored."""
    flat = jnp.zeros((V * B, D), jnp.float32)
    flat = flat.at[rows * B + jnp.arange(B)].add(query)
    return flat.reshape(V, B * D)


# ---------------------------------------------------------------------------
# entity-graph tower (TransferNBFNet)
# ---------------------------------------------------------------------------


def entity_nbfnet_config(
    input_dim: int = 64,
    hidden_dims: Sequence[int] = (64,) * 6,
    num_relations: int = 1,
    message_func: str = "distmult",
    aggregate_func: str = "sum",
    rspmm_impl: str = "xla",
    **kw,
) -> NBFNetConfig:
    return NBFNetConfig(
        input_dim=input_dim,
        hidden_dims=tuple(hidden_dims),
        num_relations=num_relations,
        message_func=message_func,
        aggregate_func=aggregate_func,
        short_cut=kw.get("short_cut", True),
        layer_norm=kw.get("layer_norm", True),
        concat_hidden=kw.get("concat_hidden", False),
        num_mlp_layer=kw.get("num_mlp_layer", 2),
        rel_mode="injected",
        project=kw.get("project", True),
        rspmm_impl=rspmm_impl,
        edge_axis=kw.get("edge_axis", ""),
        ring_exchange=kw.get("ring_exchange", "ppermute"),
        remat=kw.get("remat", False),
        compute_dtype=kw.get("compute_dtype", "float32"),
        score_chunk=int(kw.get("score_chunk", 0)),
        micro_batch=int(kw.get("micro_batch", 0)),
        stack=kw.get("stack", "auto"),
    )


def entity_nbfnet_init(key, cfg: NBFNetConfig) -> dict:
    lcfgs = cfg.layer_configs()
    keys = jax.random.split(key, len(lcfgs) + 1)
    feature_dim = (
        cfg.hidden_dims[-1] * (len(cfg.hidden_dims) if cfg.concat_hidden else 1)
        + cfg.input_dim
    )
    mlp = mlp_init(
        keys[-1], feature_dim, [feature_dim] * (cfg.num_mlp_layer - 1) + [1]
    )
    return {
        "layers": [conv_init(k, c) for k, c in zip(keys, lcfgs)],
        "mlp": mlp,
    }


def entity_nbfnet_score_all(
    params,
    cfg: NBFNetConfig,
    graph,
    rel_queries,
    source: jnp.ndarray,
    query_rel: jnp.ndarray,
    edge_grad: bool = False,
    targets: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Score every entity as the target of (source[b], query_rel[b], ?).

    Args:
      graph: undirected+inverse entity graph (2R relation types)
      rel_queries: injected relation representations — [B, 2R, D] (per-batch),
        [2R, D] (shared, CustomNBFNet-style), or a LIST of num_layers + 1
        such tensors: element 0 seeds the query, element i+1 feeds layer i
        (the multi-rel-model wiring of model.py:149-156)
      source: int [B] source entities; query_rel: int [B] in [0, 2R)
      targets: optional int [B, T] — score ONLY these entities per row and
        return [B, T] (training needs 1 + num_negative of the V entities;
        gathering final states before the MLP head drops the [V, B]-sized
        scoring matmuls from both passes — V/T ~ 100x less head work).
        Same math as indexing the [B, V] result (model.py:176-194 gathers
        `feature` at the candidate index before its MLP too).
    Returns: [B, V] scores, or [B, T] when targets is given.
    """
    B = source.shape[0]
    mb = cfg.micro_batch
    if mb and B > mb and not edge_grad:
        assert B % mb == 0, f"batch {B} not divisible by micro_batch {mb}"
        n = B // mb
        sub_cfg = dataclasses.replace(cfg, micro_batch=0)

        def chunk(t):
            return t.reshape(n, mb, *t.shape[1:])

        # per-batch tensors ride the map's xs; shared [2R, D] tensors stay
        # closed over (still differentiated through the checkpoint)
        if isinstance(rel_queries, (list, tuple)):
            rq_xs = [chunk(r) if r.ndim == 3 else None for r in rel_queries]
        else:
            rq_xs = chunk(rel_queries) if rel_queries.ndim == 3 else None
        xs = (
            chunk(source), chunk(query_rel),
            [r for r in rq_xs if r is not None]
            if isinstance(rq_xs, list) else rq_xs,
            None if targets is None else chunk(targets),
        )

        def score_one(args):
            src_c, qr_c, rel_c, tgt_c = args
            if isinstance(rel_queries, (list, tuple)):
                it = iter(rel_c)
                rq = [next(it) if x is not None else orig
                      for x, orig in zip(rq_xs, rel_queries)]
            else:
                rq = rel_queries if rel_c is None else rel_c
            return entity_nbfnet_score_all(
                params, sub_cfg, graph, rq, src_c, qr_c, targets=tgt_c
            )

        # checkpointed: the backward re-runs one chunk's propagation at a
        # time — peak HBM is a single [V, mb*D]-carry working set
        out = jax.lax.map(jax.checkpoint(score_one), xs)  # [n, mb, V|T]
        return out.reshape(B, -1)
    if isinstance(rel_queries, (list, tuple)):
        query_src = rel_queries[0]
        if len(rel_queries) == 1:
            per_layer = [rel_queries[0]] * len(cfg.hidden_dims)
        else:
            assert len(rel_queries) == len(cfg.hidden_dims) + 1
            per_layer = list(rel_queries[1:])
    else:
        query_src = rel_queries
        per_layer = [rel_queries] * len(cfg.hidden_dims)
    if query_src.ndim == 3:
        query = query_src[jnp.arange(B), query_rel]  # [B, D]
    else:  # shared [2R, D]
        query = query_src[query_rel]
    V = graph.num_nodes
    # ring permuted-IO: the whole propagation runs in the padded block domain
    # ([n*v_block] rows, degree-balanced when to_new is set) — states stay
    # row-sharded across layers; only the boundary scatter here and the
    # [B, V] score readout below map indices (see layers.ring_block_domain)
    lcfg0 = cfg.layer_configs()[0]
    ring = ring_block_domain(lcfg0, graph, edge_grad)
    if ring is not None:
        Vrows = ring.v_block * ring.n_shards
        rows = source if ring.to_new is None else ring.to_new[source]
    else:
        Vrows, rows = V, source
    boundary = _flat_boundary(Vrows, B, cfg.input_dim, rows, query)
    if all(r is per_layer[0] for r in per_layer[1:]):
        # single injected tensor: scannable stack (one compiled layer body)
        final = _propagate(
            params["layers"], cfg.layer_configs(), graph, boundary, cfg,
            rel_injected=per_layer[0], edge_grad=edge_grad,
            block_domain=ring is not None,
        )
    else:
        # distinct per-layer injections (multi-rel-model wiring): explicit loop
        hiddens = []
        x = boundary
        for p, lcfg, rel_i in zip(params["layers"], cfg.layer_configs(), per_layer):
            h = conv_apply(p, lcfg, graph, x, boundary,
                           rel_injected=rel_i, edge_grad=edge_grad,
                           block_domain=ring is not None)
            if cfg.short_cut and h.shape == x.shape:
                h = h + x
            hiddens.append(h)
            x = h
        if cfg.concat_hidden:
            final = jnp.concatenate(
                [h.reshape(Vrows, B, -1) for h in hiddens], -1
            ).reshape(Vrows, -1)
        else:
            final = hiddens[-1]
    if targets is not None:
        # gather the T target rows per batch element BEFORE the MLP head:
        # flat [Vrows, B*feat] viewed [Vrows*B, feat] — row v*B + b is
        # state(v, b) — so per-(b, t) rows are targets*B + b
        rows = targets if ring is None or ring.to_new is None \
            else ring.to_new[targets]
        feat = final.shape[1] // B
        flat_rows = final.reshape(Vrows * B, feat)
        feats = flat_rows[rows * B + jnp.arange(B)[:, None]]  # [B, T, feat]
        return _mlp_head_targets(params["mlp"], feats, query)  # [B, T]
    scores = _score_tail(params, cfg, final, query, Vrows, B)  # [B, Vrows]
    if ring is not None:
        # back to original entity order: gather score COLUMNS ([B, V] floats
        # — D-free, so the block-domain states never replicate)
        cols = jnp.arange(V) if ring.to_new is None else ring.to_new
        scores = scores[:, cols]
    return scores


def _mlp_head_split(mlp_params, final, query):
    """mlp(cat([final, broadcast(query)], -1)) without materializing the
    [V, B, feat+D] concat: the first layer's weight rows are split so the
    query half is one [B, H] matmul broadcast into the sum (same math — the
    MLP input is ordered [state; query] like the reference model.py:177-181)."""
    layers = mlp_params["layers"]
    w0, b0 = layers[0]["w"], layers[0]["b"]
    dq = query.shape[-1]
    h = (
        jnp.dot(final, w0[:-dq], precision=jax.lax.Precision.HIGHEST)
        + jnp.dot(query, w0[-dq:], precision=jax.lax.Precision.HIGHEST)[None]
        + b0
    )
    if len(layers) > 1:
        h = mlp_apply({"layers": layers[1:]}, jax.nn.relu(h))
    return h


def _mlp_head_targets(mlp_params, feats, query):
    """The target-gathered head: feats [B, T, feat], query [B, D] -> [B, T].
    Same split-weight formulation as _mlp_head_split (MLP input ordered
    [state; query]), with the query term broadcast over T."""
    layers = mlp_params["layers"]
    w0, b0 = layers[0]["w"], layers[0]["b"]
    dq = query.shape[-1]
    h = (
        jnp.dot(feats, w0[:-dq], precision=jax.lax.Precision.HIGHEST)
        + jnp.dot(query, w0[-dq:], precision=jax.lax.Precision.HIGHEST)[:, None, :]
        + b0
    )
    if len(layers) > 1:
        h = mlp_apply({"layers": layers[1:]}, jax.nn.relu(h))
    return h[..., 0]


def _score_tail(params, cfg: NBFNetConfig, final, query, V, B):
    """cat(final, query) -> MLP -> [B, V]; optionally chunked over entities
    so only [score_chunk, B, *] intermediates are live at once.

    ``final`` is flat [V, B*feat]; each chunk is viewed [C, B, feat] only
    inside its own matmul zone."""
    C = cfg.score_chunk
    if not C or V <= C:
        score = _mlp_head_split(
            params["mlp"], final.reshape(V, B, -1), query
        )[..., 0]  # [V, B]
        return score.T  # [B, V]
    n = -(-V // C)
    pad = n * C - V
    if pad:
        final = jnp.concatenate(
            [final, jnp.zeros((pad,) + final.shape[1:], final.dtype)], 0
        )
    chunks = final.reshape(n, C, B, -1)

    def score_one(chunk):
        return _mlp_head_split(params["mlp"], chunk, query)[..., 0]  # [C, B]

    score = jax.lax.map(score_one, chunks).reshape(n * C, B)[:V]
    return score.T  # [B, V]
