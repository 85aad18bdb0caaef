"""Initial node-feature builders for relation-graph models.

Faithful port of the reference's ``_reset_input`` input-type dispatch
(/root/reference/ultra/rel_model.py:19-51): an input_type string joins one or
more of {ones, zeros, glorot, embedding, degree_encoding,
random_walk_encoding} with "__", and the selected feature sources are summed.

Note: the shipped RelNBFNet discards these features (its forward conditions on
the query relation only — rel_model.py:406-416); they matter for the generic
RelationModel path and for input-type ablations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..nn.core import embedding_init
from ..utils.rwse import random_walk_se

NUM_DEGREES = 1000
NUM_RANDOM_WALK_BUCKETS = 40


def rel_input_param_init(key, input_type: str, num_relations: int, dim: int) -> dict:
    """Learnable tables some input types need (rel_model.py:172-179)."""
    params = {}
    keys = jax.random.split(key, 3)
    if "embedding" in input_type:
        params["rel_embedding"] = embedding_init(keys[0], num_relations, dim)
    if "degree_encoding" in input_type:
        params["deg_embedding"] = embedding_init(keys[1], NUM_DEGREES, dim)
    if "random_walk_encoding" in input_type:
        params["random_walk_embedding"] = embedding_init(
            keys[2], NUM_RANDOM_WALK_BUCKETS + 1, dim
        )
    return params


def build_initial_features(
    key,
    graph,
    input_type: str,
    dim: int,
    params: dict = None,
    node_feature=None,
) -> jnp.ndarray:
    """[V, dim] summed initial features per the input_type recipe."""
    params = params or {}
    V = graph.num_nodes
    out = jnp.zeros((V, dim), jnp.float32)
    for k in input_type.split("__"):
        if k == "ones":
            out = out + jnp.ones((V, dim))
        elif k == "zeros":
            pass
        elif k == "glorot":
            scale = (6.0 / (V + dim)) ** 0.5
            out = out + jax.random.uniform(key, (V, dim), minval=-scale, maxval=scale)
        elif k == "embedding":
            out = out + params["rel_embedding"]["weight"][:V]
        elif k == "degree_encoding":
            deg = jnp.clip(graph.degree_out().astype(jnp.int32), 0, NUM_DEGREES - 1)
            out = out + params["deg_embedding"]["weight"][deg]
        elif k == "random_walk_encoding":
            feats = node_feature
            if feats is None:
                feats = jnp.asarray(random_walk_se(graph, 8))
            buckets = jnp.minimum(
                (feats * 1000).astype(jnp.int32)[:, :8], NUM_RANDOM_WALK_BUCKETS
            )
            out = out + params["random_walk_embedding"]["weight"][buckets].mean(axis=1)
        elif k in ("random_walk", "rrpe"):
            feats = node_feature
            if feats is None:
                feats = jnp.asarray(random_walk_se(graph, dim))
            out = out + feats
        else:
            raise ValueError(f"unknown input type component {k!r}")
    return out
