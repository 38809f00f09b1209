"""Classification metrics — in-graph, confusion-count based.

Replaces the reference's per-call torchmetrics objects (utils.py:18-62,
hardcoded `.to('cuda')`) with jit-friendly pure functions: a single confusion
count is computed on device; every derived metric is a scalar expression of
it, matching torchmetrics' binary definitions (zero denominators → 0.0, the
torchmetrics `_safe_divide` convention; NPV guard mirrors utils.py:48-52).

AUROC is the rank-based (Mann-Whitney) statistic with average ranks for ties,
which equals the trapezoidal ROC integral torchmetrics computes for binary
tasks.  Under data parallelism, counts (and the score/label vectors for
AUROC) are `psum`/all-gathered across the mesh — the `sync_dist=True`
equivalent (reference model_cross.py:246-255).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def confusion_counts(preds: jax.Array, labels: jax.Array) -> dict:
    """Binary confusion counts. preds/labels: (B,) 0/1 ints."""
    preds = preds.astype(jnp.int32)
    labels = labels.astype(jnp.int32)
    tp = jnp.sum((preds == 1) & (labels == 1))
    tn = jnp.sum((preds == 0) & (labels == 0))
    fp = jnp.sum((preds == 1) & (labels == 0))
    fn = jnp.sum((preds == 0) & (labels == 1))
    return {"tp": tp, "tn": tn, "fp": fp, "fn": fn}


def _safe_div(num, den):
    den = den.astype(jnp.float32)
    return jnp.where(den > 0, num.astype(jnp.float32) / jnp.maximum(den, 1.0), 0.0)


def metrics_from_counts(c: dict) -> dict:
    """accuracy / precision / recall (sensitivity) / specificity / f1 / npv —
    the exact metric set of reference utils.py:18-62."""
    tp, tn, fp, fn = (c[k] for k in ("tp", "tn", "fp", "fn"))
    return {
        "accuracy": _safe_div(tp + tn, tp + tn + fp + fn),
        "precision": _safe_div(tp, tp + fp),
        "recall": _safe_div(tp, tp + fn),
        "specificity": _safe_div(tn, tn + fp),
        "f1_score": _safe_div(2 * tp, 2 * tp + fp + fn),
        "npv": _safe_div(tn, tn + fn),
    }


def compute_metrics(preds: jax.Array, labels: jax.Array) -> dict:
    """Drop-in equivalent of reference utils.compute_metrics(preds, labels)."""
    return metrics_from_counts(confusion_counts(preds, labels))


def binary_auroc(scores: jax.Array, labels: jax.Array) -> jax.Array:
    """AUROC via the Mann-Whitney U statistic with tie-averaged ranks.

    scores: (N,) probabilities/logits for the positive class; labels: (N,) 0/1.
    Equals torchmetrics.functional.auroc(task='binary').  Returns 0.0 when a
    class is absent (torchmetrics returns NaN + warning there; 0.0 keeps the
    training loop total-order safe).
    """
    scores = scores.astype(jnp.float32)
    labels = labels.astype(jnp.float32)
    n = scores.shape[0]

    order = jnp.argsort(scores)
    sorted_scores = scores[order]
    sorted_labels = labels[order]

    # average ranks for ties: rank_i = mean of 1-based positions of the tie group
    pos_idx = jnp.arange(1, n + 1, dtype=jnp.float32)
    # group boundaries where the sorted score changes
    new_group = jnp.concatenate([jnp.ones((1,), bool),
                                 sorted_scores[1:] != sorted_scores[:-1]])
    group_id = jnp.cumsum(new_group.astype(jnp.int32)) - 1
    group_sum = jax.ops.segment_sum(pos_idx, group_id, num_segments=n)
    group_cnt = jax.ops.segment_sum(jnp.ones_like(pos_idx), group_id, num_segments=n)
    avg_rank = (group_sum / jnp.maximum(group_cnt, 1.0))[group_id]

    n_pos = jnp.sum(sorted_labels)
    n_neg = n - n_pos
    rank_sum_pos = jnp.sum(avg_rank * sorted_labels)
    u = rank_sum_pos - n_pos * (n_pos + 1) / 2.0
    denom = n_pos * n_neg
    return jnp.where(denom > 0, u / jnp.maximum(denom, 1.0), 0.0)


class MetricAccumulator:
    """Host-side epoch accumulator: sums confusion counts and loss, collects
    scores/labels for AUROC; `result()` yields the epoch's metric dict.

    This is the on_epoch=True aggregation the reference gets from Lightning
    `self.log(..., on_epoch=True, on_step=False)` (model_cross.py:246-255).
    """

    def __init__(self):
        self.counts = {"tp": 0, "tn": 0, "fp": 0, "fn": 0}
        self.loss_sum = 0.0
        self.loss_n = 0
        self.scores = []
        self.labels = []

    def update(self, loss: float, counts: dict, scores, labels) -> None:
        for k in self.counts:
            self.counts[k] += int(counts[k])
        self.loss_sum += float(loss)
        self.loss_n += 1
        import numpy as np
        self.scores.append(np.asarray(scores))
        self.labels.append(np.asarray(labels))

    def result(self) -> dict:
        import numpy as np
        c = {k: jnp.asarray(v) for k, v in self.counts.items()}
        out = {k: float(v) for k, v in metrics_from_counts(c).items()}
        out["loss"] = self.loss_sum / max(self.loss_n, 1)
        if self.scores:
            scores = np.concatenate(self.scores)
            labels = np.concatenate(self.labels)
            out["auc_roc"] = float(binary_auroc(jnp.asarray(scores),
                                                jnp.asarray(labels)))
        return out
