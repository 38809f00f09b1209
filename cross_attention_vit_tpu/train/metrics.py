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
    """Epoch accumulator with O(1) blocking host syncs per epoch.

    `update()` accumulates confusion counts and the batch-size-weighted loss
    sum as *device* scalars (tiny async dispatches, nothing blocks) and keeps
    the per-batch score/label arrays wherever they live; `result()` fetches
    everything in ONE `jax.device_get`.  This keeps the train epoch free of
    per-step D2H traffic — on hosts with a slow device link the per-step sync
    was the epoch bottleneck.

    The loss mean is weighted by batch size, matching Lightning's
    on_epoch=True aggregation (the reference logs via `self.log(...,
    on_epoch=True)`, model_cross.py:246-255 — Lightning weights by batch
    size, so a partial last batch is not overweighted).  Classification
    metrics are micro-aggregated from epoch confusion counts and AUROC is
    epoch-global — a deliberate improvement over Lightning's mean of
    per-step AUROCs (documented divergence).
    """

    def __init__(self):
        self.counts = None
        self.loss_sum = None
        self.n = 0
        self.scores = []
        self.labels = []

    def update(self, loss, counts: dict, scores, labels) -> None:
        bs = int(labels.shape[0])
        w_loss = loss * bs
        if self.counts is None:
            self.counts = dict(counts)
            self.loss_sum = w_loss
        else:
            self.counts = {k: self.counts[k] + counts[k] for k in counts}
            self.loss_sum = self.loss_sum + w_loss
        self.n += bs
        self.scores.append(scores)
        self.labels.append(labels)

    def result(self) -> dict:
        import numpy as np

        if self.counts is None:
            return {}
        counts, loss_sum, scores, labels = jax.device_get(
            (self.counts, self.loss_sum, self.scores, self.labels))
        out = {k: float(v) for k, v in metrics_from_counts(counts).items()}
        out["loss"] = float(loss_sum) / max(self.n, 1)
        if scores:
            out["auc_roc"] = float(binary_auroc(
                jnp.asarray(np.concatenate(scores)),
                jnp.asarray(np.concatenate(labels))))
        return out
