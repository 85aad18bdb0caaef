"""Knowledge-graph completion task math: loss, filtered ranking, metrics.

Replicates the reference's protocol exactly (the parts that move MRR):

  * BCE with self-adversarial negative weighting (task.py:160-195)
  * filtered rank = 1 + #{allowed v : score_v >= score_pos}, ties pessimistic
    (task.py:307-315)
  * metric suite: mr, mrr, hits@k, hits@k_sampleN unbiased estimator,
    -tail/-head direction splits, per-relation breakdown (task.py:317-351,
    463-523)
"""

from __future__ import annotations

import math
from typing import Dict, Sequence

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# loss
# ---------------------------------------------------------------------------


def bce_self_adversarial(
    scores: jnp.ndarray,
    adversarial_temperature: float = 1.0,
    sample_weight: jnp.ndarray = None,
) -> jnp.ndarray:
    """scores: [B, 1+N], column 0 is the positive. Returns scalar loss."""
    num_negative = scores.shape[1] - 1
    target = jnp.zeros_like(scores).at[:, 0].set(1.0)
    # binary_cross_entropy_with_logits
    loss = jnp.clip(scores, 0, None) - scores * target + jnp.log1p(
        jnp.exp(-jnp.abs(scores))
    )
    if adversarial_temperature > 0:
        neg_w = jax.nn.softmax(
            jax.lax.stop_gradient(scores[:, 1:]) / adversarial_temperature, axis=-1
        )
    else:
        neg_w = jnp.full_like(scores[:, 1:], 1.0 / num_negative)
    weight = jnp.concatenate([jnp.ones_like(scores[:, :1]), neg_w], axis=1)
    loss = (loss * weight).sum(axis=-1) / weight.sum(axis=-1)
    if sample_weight is not None:
        return (loss * sample_weight).sum() / sample_weight.sum()
    return loss.mean()


def margin_ranking(scores: jnp.ndarray, margin: float = 6.0) -> jnp.ndarray:
    """criterion='ranking' (task.py:701-705)."""
    pos, neg = scores[:, :1], scores[:, 1:]
    return jnp.clip(margin - (pos - neg), 0, None).mean()


def cross_entropy_positive(scores: jnp.ndarray) -> jnp.ndarray:
    """criterion='ce' (task.py:698-700): positive is class 0."""
    return (-jax.nn.log_softmax(scores, axis=-1)[:, 0]).mean()


# ---------------------------------------------------------------------------
# ranking
# ---------------------------------------------------------------------------


def filtered_ranking(
    scores: jnp.ndarray,
    target: jnp.ndarray,
    truth_mask: jnp.ndarray,
    filtered: bool = True,
) -> jnp.ndarray:
    """scores [B, V]; target [B] (true entity); truth_mask [B, V] True where
    the candidate completes a known true triple (and is therefore filtered
    out). Returns int ranking [B]."""
    pos = jnp.take_along_axis(scores, target[:, None], axis=1)  # [B,1]
    geq = scores >= pos
    if filtered:
        geq = geq & ~truth_mask
    return geq.sum(axis=-1) + 1


# ---------------------------------------------------------------------------
# metrics
# ---------------------------------------------------------------------------


def _metric_scores(ranking: jnp.ndarray, name: str, num_candidates=None):
    """Per-sample scores for one metric over an integer ranking array."""
    if name == "mr":
        return ranking.astype(jnp.float32)
    if name == "mrr":
        return 1.0 / ranking.astype(jnp.float32)
    if name.startswith("hits@"):
        values = name[5:].split("_")
        threshold = int(values[0])
        if len(values) > 1:
            # unbiased estimator with num_sample negatives (task.py:492-509)
            num_sample = int(values[1])
            fp_rate = (ranking - 1).astype(jnp.float32) / num_candidates
            score = jnp.zeros_like(fp_rate)
            for i in range(threshold):
                num_comb = (
                    math.factorial(num_sample)
                    / math.factorial(i)
                    / math.factorial(num_sample - i)
                )
                score = score + num_comb * (fp_rate**i) * (
                    (1 - fp_rate) ** (num_sample - i)
                )
            return score
        return (ranking <= threshold).astype(jnp.float32)
    raise ValueError(f"unknown metric {name!r}")


def evaluate_ranking(
    ranking: jnp.ndarray,
    metrics: Sequence[str],
    num_candidates: jnp.ndarray = None,
    rel_index: jnp.ndarray = None,
    num_relations: int = None,
) -> Dict[str, jnp.ndarray]:
    """ranking: [B, 2] (tail-direction at [:, 0], head-direction at [:, 1])
    or [B]. Metric names may carry a -tail / -head suffix.

    num_candidates: same shape as ranking — the per-sample count of allowed
    candidates, needed by the hits@k_sampleN estimator.
    rel_index: same shape — relation id per sample, enables the per-relation
    breakdown when num_relations is given (metric_per_rel, task.py:514-518).
    """
    out = {}
    for m in metrics:
        if "-" in m:
            base, direction = m.split("-")
            col = {"tail": 0, "head": 1}[direction]
            r = ranking[:, col]
            nc = None if num_candidates is None else num_candidates[:, col]
        else:
            base, r = m, ranking
            nc = num_candidates
        score = _metric_scores(r, base, nc)
        if rel_index is not None and num_relations is not None and "-" not in m:
            flat_s, flat_r = score.reshape(-1), rel_index.reshape(-1)
            sums = jax.ops.segment_sum(flat_s, flat_r, num_segments=num_relations)
            cnts = jax.ops.segment_sum(
                jnp.ones_like(flat_s), flat_r, num_segments=num_relations
            )
            per_rel = sums / jnp.maximum(cnts, 1)
            for ridx in range(num_relations):
                out[f"{m}_rel_{ridx}"] = per_rel[ridx]
        out[m] = score.mean()
    return out


def toy_eval_ranking(
    key,
    scores_pos: jnp.ndarray,
    scores: jnp.ndarray,
    allowed_mask: jnp.ndarray,
    num_samples: int = 50,
) -> jnp.ndarray:
    """50-sampled-negative protocol with optimistic/pessimistic rank averaging
    (task.py:474-484). scores_pos [B,1]; scores/allowed_mask [B,V]."""
    B, V = scores.shape
    num_samples = min(num_samples, V)  # tiny graphs: cannot draw 50 negatives
    logits = jnp.where(allowed_mask, 0.0, -jnp.inf)
    gumbel = jax.random.gumbel(key, (B, V))
    idx = jax.lax.top_k(logits + gumbel, num_samples)[1]  # w/o replacement
    neg = jnp.take_along_axis(scores, idx, axis=1)
    optimistic = (scores_pos < neg).sum(axis=-1)
    pessimistic = (scores_pos <= neg).sum(axis=-1)
    return 0.5 * (optimistic + pessimistic) + 1
