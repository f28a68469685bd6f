"""Loss and metric pieces (reference: ``AdaQP/trainer/trainer.py:157-158``,
``runtime_util.py:139-197``).

The reference pairs a SUM-reduction loss with division by the GLOBAL train
count (``runtime_util.py:102``) and then all-reduce-SUMS gradients without
dividing (``runtime_util.py:71-77``) — the pair is equivalent to a proper
global mean and must be preserved together (SURVEY.md §7.4). Here each
shard returns its local sum; the caller divides by the global count, and
gradient summation happens in AD's psum transpose of replicated params.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_loss_sum(logits: jnp.ndarray, labels: jnp.ndarray, mask: jnp.ndarray, multilabel: bool) -> jnp.ndarray:
    """Sum of per-node losses over masked rows (one shard).

    single-label: cross entropy; multilabel: BCE-with-logits summed over all
    label dimensions (torch BCEWithLogitsLoss(reduction='sum') semantics).
    """
    if multilabel:
        per_elt = jnp.maximum(logits, 0.0) - logits * labels + jnp.log1p(
            jnp.exp(-jnp.abs(logits))
        )
        per_node = per_elt.sum(axis=-1)
    else:
        logz = jax.nn.logsumexp(logits, axis=-1)
        picked = jnp.take_along_axis(logits, labels[:, None].astype(jnp.int32), axis=-1)[
            :, 0
        ]
        per_node = logz - picked
    return jnp.where(mask, per_node, 0.0).sum()


def correct_count(logits: jnp.ndarray, labels: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """# correctly classified masked nodes (single-label accuracy pieces,
    reference ``runtime_util.py:139-147``)."""
    pred = jnp.argmax(logits, axis=-1)
    return (jnp.where(mask, pred == labels, False)).sum()


def f1_pieces(logits: jnp.ndarray, labels: jnp.ndarray, mask: jnp.ndarray):
    """(TP, FP, FN) for micro-F1 over masked rows (multilabel, reference
    ``runtime_util.py:149-155``): prediction = logits > 0."""
    pred = logits > 0.0
    truth = labels > 0.5
    m = mask[:, None]
    tp = (pred & truth & m).sum()
    fp = (pred & ~truth & m).sum()
    fn = (~pred & truth & m).sum()
    return tp, fp, fn
