"""Checkpointing: native format + one-way importer for the reference's
torch ``.pth`` checkpoints (so td_ultra_3g/4g zero-shot parity runs work).

Native format: a pickle of numpy-ified parameter/optimizer pytrees (graphs
are environment, not weights — they are never serialized, matching the
reference's clean_save buffer scrubbing at /root/reference/ultra/util.py:278-325).

fix_reasoner load semantics (util.py:249-259): keep the *current* model's
relation-projection / relation-embedding / query weights while loading
everything else (frozen-reasoner fine-tuning).
"""

from __future__ import annotations

import pickle
import re
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_REASONER_PATTERNS = ("relation.weight", "relation_projection", "relation_linear", "query.weight")


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def _to_device(tree):
    return jax.tree_util.tree_map(jnp.asarray, tree)


def save_checkpoint(path: str, params, opt_state=None, epoch: int = 0):
    state = {
        "params": _to_numpy(params),
        "opt_state": _to_numpy(opt_state) if opt_state is not None else None,
        "epoch": epoch,
        "format": "ultra_tpu_v1",
    }
    with open(path, "wb") as f:
        pickle.dump(state, f)


def load_checkpoint(
    path: str,
    params_template,
    opt_state_template=None,
    fix_reasoner: bool = False,
) -> Tuple[Any, Any, Optional[int]]:
    if path.endswith(".pth"):
        params = import_torch_checkpoint(
            path, params_template, fix_reasoner=fix_reasoner
        )
        return params, None, None
    with open(path, "rb") as f:
        state = pickle.load(f)
    params = state["params"]
    if fix_reasoner:
        params = _keep_reasoner_weights(params, params_template)
    # validate structure against the template
    t1 = jax.tree_util.tree_structure(params_template)
    t2 = jax.tree_util.tree_structure(params)
    if t1 != t2:
        raise ValueError(f"checkpoint structure mismatch:\n{t2}\nvs template\n{t1}")
    opt_state = None
    if opt_state_template is not None and state.get("opt_state") is not None:
        try:
            opt_state = jax.tree_util.tree_unflatten(
                jax.tree_util.tree_structure(opt_state_template),
                [jnp.asarray(x) for x in jax.tree_util.tree_leaves(state["opt_state"])],
            )
        except Exception:
            opt_state = None  # different optimizer config: fresh state
    return _to_device(params), opt_state, state.get("epoch")


def _flatten_with_paths(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten_with_paths(v, f"{prefix}{k}."))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten_with_paths(v, f"{prefix}{i}."))
    else:
        out[prefix[:-1]] = tree
    return out


def _keep_reasoner_weights(loaded, current):
    """Replace reasoner-related leaves of `loaded` with those of `current`."""

    def visit(l, c, path=""):
        if isinstance(l, dict):
            return {k: visit(l[k], c[k], f"{path}{k}.") for k in l}
        if isinstance(l, (list, tuple)):
            t = [visit(a, b, f"{path}{i}.") for i, (a, b) in enumerate(zip(l, c))]
            return type(l)(t) if isinstance(l, tuple) else t
        norm = path[:-1].replace("scale", "weight")
        if any(pat.split(".")[0] in norm for pat in ("relation_projection", "relation_linear")) or \
           norm.endswith("relation.weight") or norm.endswith("query.weight"):
            return c
        return l
    return visit(loaded, current)


# ---------------------------------------------------------------------------
# torch .pth importer
# ---------------------------------------------------------------------------


def import_torch_checkpoint(path: str, params_template, fix_reasoner: bool = False):
    """Map the reference's state-dict layout onto our parameter tree.

    Full key inventory of a real ``td_ultra_*`` checkpoint (the task module
    tree: MultiGraphPreTraining wrapping TransferNBFNet at
    /root/reference/ultra/model.py:17-56 + RelationModelList[RelNBFNet] at
    rel_model.py:381-416; per-layer params from layer.py:210-229 (Mod) and
    layer.py:30-50; torch Linear weights are [out, in] -> transposed here):

      mapped (weights the forward pass uses):
        model.layers.{i}.linear.{weight,bias}             -> entity.layers[i].linear.{w^T,b}
        model.layers.{i}.layer_norm.{weight,bias}         -> entity.layers[i].layer_norm.{scale,bias}
        model.layers.{i}.relation_projection.layers.{j}.{weight,bias}
                                                          -> entity.layers[i].relation_projection.layers[j].{w^T,b}
        model.mlp.layers.{j}.{weight,bias}                -> entity.mlp.layers[j].{w^T,b}
        rel_models.{t}.model.layers.{i}.linear.*          -> relation[t].layers[i].linear
        rel_models.{t}.model.layers.{i}.layer_norm.*      -> relation[t].layers[i].layer_norm
        rel_models.{t}.model.layers.{i}.relation.weight   -> relation[t].layers[i].relation.weight
        rel_models.{t}.model.learnable_q.weight           -> relation[t].learnable_q.weight
                                                             (learn_query configs, rel_model.py:345-349)
      deliberately ignored (dead in the reference forward, or environment):
        model.dist_embed.weight                 (instantiated at model.py:56, never used)
        rel_models.{t}.model.mlp.layers.{j}.*   (rel-tower scorer, rel_model.py:263 — unused by RelNBFNet.forward)
        model.query / *.query.weight            (commented out upstream; TransferNBFNet.query is data, not a param)
        {fact_,train_,valid_,test_,}graph*, *rel_graph* buffers (non-tensor; scrubbed
                                                 like util.py:241-247 — also skipped here by the tensor check)
        DDP "module." prefixes                  (stripped)
      optimizer state: present in the file ({"model", "optimizer"}) but dropped,
        matching safe_load's default drop_optimizer=True (util.py:233,263-269).
    Anything else raises a warning (unmatched keys = schema drift).
    """
    import torch

    state = torch.load(path, map_location="cpu", weights_only=False)
    sd = state["model"] if isinstance(state, dict) and "model" in state else state
    sd = {re.sub(r"^module\.", "", k): v for k, v in sd.items()}

    params = jax.tree_util.tree_map(lambda x: np.array(x), params_template)

    def _rel_path(params, tower_idx):
        # single tower: params["relation"] is a dict; multi: a list of dicts
        if isinstance(params["relation"], list):
            return ["relation", tower_idx]
        if tower_idx != 0:
            raise ValueError(
                f"checkpoint has rel_models.{tower_idx} but the model is "
                f"configured with a single relation tower"
            )
        return ["relation"]

    def assign(dst_parts, value, transpose=False):
        node = params
        for p in dst_parts[:-1]:
            node = node[p]
        value = np.asarray(value.detach().numpy(), np.float32)
        if transpose:
            value = value.T
        want = node[dst_parts[-1]].shape
        if value.shape != want:
            raise ValueError(
                f"shape mismatch for {dst_parts}: ckpt {value.shape} vs {want}"
            )
        node[dst_parts[-1]] = value

    unmatched = []
    for key, value in sd.items():
        if not hasattr(value, "detach"):
            continue
        if fix_reasoner and any(p in key for p in _REASONER_PATTERNS):
            continue
        m = re.match(r"model\.layers\.(\d+)\.linear\.(weight|bias)$", key)
        if m:
            i, wb = int(m.group(1)), m.group(2)
            assign(["entity", "layers", i, "linear", "w" if wb == "weight" else "b"],
                   value, transpose=(wb == "weight"))
            continue
        m = re.match(r"model\.layers\.(\d+)\.layer_norm\.(weight|bias)$", key)
        if m:
            i, wb = int(m.group(1)), m.group(2)
            assign(["entity", "layers", i, "layer_norm",
                    "scale" if wb == "weight" else "bias"], value)
            continue
        m = re.match(
            r"model\.layers\.(\d+)\.relation_projection\.layers\.(\d+)\.(weight|bias)$",
            key,
        )
        if m:
            i, j, wb = int(m.group(1)), int(m.group(2)), m.group(3)
            assign(["entity", "layers", i, "relation_projection", "layers", j,
                    "w" if wb == "weight" else "b"], value, transpose=(wb == "weight"))
            continue
        m = re.match(r"model\.mlp\.layers\.(\d+)\.(weight|bias)$", key)
        if m:
            j, wb = int(m.group(1)), m.group(2)
            assign(["entity", "mlp", "layers", j, "w" if wb == "weight" else "b"],
                   value, transpose=(wb == "weight"))
            continue
        m = re.match(r"rel_models\.(\d+)\.model\.layers\.(\d+)\.linear\.(weight|bias)$", key)
        if m:
            t, i, wb = int(m.group(1)), int(m.group(2)), m.group(3)
            assign(_rel_path(params, t) + ["layers", i, "linear",
                    "w" if wb == "weight" else "b"],
                   value, transpose=(wb == "weight"))
            continue
        m = re.match(r"rel_models\.(\d+)\.model\.layers\.(\d+)\.layer_norm\.(weight|bias)$", key)
        if m:
            t, i, wb = int(m.group(1)), int(m.group(2)), m.group(3)
            assign(_rel_path(params, t) + ["layers", i, "layer_norm",
                    "scale" if wb == "weight" else "bias"], value)
            continue
        m = re.match(r"rel_models\.(\d+)\.model\.layers\.(\d+)\.relation\.weight$", key)
        if m:
            t, i = int(m.group(1)), int(m.group(2))
            assign(_rel_path(params, t) + ["layers", i, "relation", "weight"], value)
            continue
        m = re.match(r"rel_models\.(\d+)\.model\.learnable_q\.weight$", key)
        if m:
            t = int(m.group(1))
            node = params
            for p in _rel_path(params, t):
                node = node[p]
            if "learnable_q" in node:  # learn_query configs only
                assign(_rel_path(params, t) + ["learnable_q", "weight"], value)
            continue
        if re.search(r"dist_embed|rel_models\.\d+\.model\.mlp|graph|query\.weight", key):
            continue
        unmatched.append(key)
    if unmatched:
        import warnings

        warnings.warn(f"unmatched checkpoint keys: {unmatched}")
    return _to_device(params)


def export_torch_checkpoint(path: str, params):
    """Write our parameter tree as a reference-layout torch ``.pth`` state
    dict (inverse of import_torch_checkpoint) — lets reference-side tooling
    consume checkpoints trained here. Dead reference parameters that have no
    counterpart (dist_embed, rel-tower mlp) are emitted as zeros so strict
    loaders find every key."""
    import torch

    sd = {}

    def put(key, arr, transpose=False):
        a = np.asarray(arr, np.float32)
        if transpose:
            a = a.T
        sd[key] = torch.tensor(a)

    entity = params["entity"]
    for i, lp in enumerate(entity["layers"]):
        put(f"model.layers.{i}.linear.weight", lp["linear"]["w"], transpose=True)
        put(f"model.layers.{i}.linear.bias", lp["linear"]["b"])
        if "layer_norm" in lp:
            put(f"model.layers.{i}.layer_norm.weight", lp["layer_norm"]["scale"])
            put(f"model.layers.{i}.layer_norm.bias", lp["layer_norm"]["bias"])
        if "relation_projection" in lp:
            for j, mp in enumerate(lp["relation_projection"]["layers"]):
                put(f"model.layers.{i}.relation_projection.layers.{j}.weight",
                    mp["w"], transpose=True)
                put(f"model.layers.{i}.relation_projection.layers.{j}.bias",
                    mp["b"])
    for j, mp in enumerate(entity["mlp"]["layers"]):
        put(f"model.mlp.layers.{j}.weight", mp["w"], transpose=True)
        put(f"model.mlp.layers.{j}.bias", mp["b"])
    d = np.asarray(entity["layers"][0]["linear"]["w"]).shape[1]
    sd["model.dist_embed.weight"] = torch.zeros(10, d)

    relation = params["relation"]
    towers = relation if isinstance(relation, list) else [relation]
    for t, tower in enumerate(towers):
        for i, lp in enumerate(tower["layers"]):
            put(f"rel_models.{t}.model.layers.{i}.linear.weight",
                lp["linear"]["w"], transpose=True)
            put(f"rel_models.{t}.model.layers.{i}.linear.bias", lp["linear"]["b"])
            if "layer_norm" in lp:
                put(f"rel_models.{t}.model.layers.{i}.layer_norm.weight",
                    lp["layer_norm"]["scale"])
                put(f"rel_models.{t}.model.layers.{i}.layer_norm.bias",
                    lp["layer_norm"]["bias"])
            if "relation" in lp:
                put(f"rel_models.{t}.model.layers.{i}.relation.weight",
                    lp["relation"]["weight"])
        # dead rel-tower scoring mlp the reference instantiates
        hid = np.asarray(tower["layers"][-1]["linear"]["w"]).shape[1]
        sd[f"rel_models.{t}.model.mlp.layers.0.weight"] = torch.zeros(2 * hid, 2 * hid)
        sd[f"rel_models.{t}.model.mlp.layers.0.bias"] = torch.zeros(2 * hid)
        sd[f"rel_models.{t}.model.mlp.layers.1.weight"] = torch.zeros(hid, 2 * hid)
        sd[f"rel_models.{t}.model.mlp.layers.1.bias"] = torch.zeros(hid)

    torch.save({"model": sd, "optimizer": {}}, path)
    return path
