"""Negative sampling under static shapes.

Replicates the reference's strict negative sampling
(/root/reference/ultra/task.py:102-118 + torchdrug ``variadic_sample``):
uniform sampling *with replacement* from the per-query candidate set
(all entities that do NOT complete a true triple in the fact graph). The
variable-length candidate lists become [B, V] masks + inverse-CDF sampling.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .match import head_truth_mask, tail_truth_mask


def sample_from_mask(key, mask: jnp.ndarray, num_samples: int) -> jnp.ndarray:
    """Sample uniformly (with replacement) from True positions of each row.

    Args:
      mask: bool [B, V]
      num_samples: draws per row
    Returns:
      int32 [B, num_samples] — indices into [0, V). Rows with an empty
      candidate set return index V-1, the defensive clamp's landing spot
      (cannot occur for the reference's use: a positive triple always leaves
      >= 1 candidate).
    """
    counts = mask.sum(axis=-1)  # [B]
    u = jax.random.uniform(key, (mask.shape[0], num_samples))
    # j-th candidate, j in [0, count): same distribution as variadic_sample
    j = jnp.floor(u * jnp.maximum(counts, 1)[:, None]).astype(jnp.int32)
    j = jnp.minimum(j, jnp.maximum(counts - 1, 0)[:, None])
    cum = jnp.cumsum(mask.astype(jnp.int32), axis=-1)  # [B, V]
    # index of the (j+1)-th True = first v with cum[v] == j+1
    idx = jax.vmap(lambda c, jj: jnp.searchsorted(c, jj + 1, side="left"))(cum, j)
    return jnp.minimum(idx.astype(jnp.int32), mask.shape[1] - 1)


def strict_negatives(
    key,
    fact_edge_list: jnp.ndarray,
    pos_h: jnp.ndarray,
    pos_t: jnp.ndarray,
    pos_r: jnp.ndarray,
    num_nodes: int,
    num_negative: int,
) -> jnp.ndarray:
    """[B, num_negative] — first half of the batch gets corrupted tails,
    second half corrupted heads (task.py:106-118, 273-274). Candidates exclude
    every entity completing a true triple in the fact graph."""
    batch_size = pos_h.shape[0]
    half = batch_size // 2
    key_t, key_h = jax.random.split(key)

    t_truth = tail_truth_mask(fact_edge_list, pos_h[:half], pos_r[:half], num_nodes)
    neg_t = sample_from_mask(key_t, ~t_truth, num_negative)

    h_truth = head_truth_mask(fact_edge_list, pos_t[half:], pos_r[half:], num_nodes)
    neg_h = sample_from_mask(key_h, ~h_truth, num_negative)

    return jnp.concatenate([neg_t, neg_h], axis=0)
