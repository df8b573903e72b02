"""Segmentation losses: masked cross-entropy and Lovász-softmax.

The reference trains with NLL on log-softmax logits plus an optional Lovász
hinge on the softmax (models/segmentation/sparseconv3d.py:44-56,
metrics/lovasz_loss.py).  Both here are static-shape with validity masks
(padding rows and IGNORE_LABEL=-1 contribute exactly zero).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["cross_entropy", "lovasz_softmax", "segmentation_loss"]

IGNORE_LABEL = -1


def cross_entropy(logits, labels, valid=None, class_weights=None):
    """Mean masked CE.  ``labels`` int32 with -1 = ignore; optional
    per-class weights (the reference's sqrt-inverse-frequency weights,
    datasets/base_dataset.py:558)."""
    mask = labels != IGNORE_LABEL
    if valid is not None:
        mask = mask & valid
    safe = jnp.maximum(labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[:, None], axis=-1)[:, 0]
    w = mask.astype(jnp.float32)
    if class_weights is not None:
        w = w * jnp.asarray(class_weights, jnp.float32)[safe]
    nll = nll * w
    return jnp.sum(nll) / jnp.maximum(jnp.sum(w), 1e-6)


def _lovasz_grad(fg_sorted):
    gts = jnp.sum(fg_sorted)
    inter = gts - jnp.cumsum(fg_sorted)
    union = gts + jnp.cumsum(1.0 - fg_sorted)
    jaccard = 1.0 - inter / jnp.maximum(union, 1.0)
    return jnp.concatenate([jaccard[:1], jaccard[1:] - jaccard[:-1]])


def lovasz_softmax(logits, labels, valid=None):
    """Multi-class Lovász-softmax (present-classes mean).

    Invalid rows get error exactly 0, so they sort to the tail and contribute
    nothing to the per-class dot product (metrics/lovasz_loss.py semantics
    without its dynamic filtering).
    """
    mask = labels != IGNORE_LABEL
    if valid is not None:
        mask = mask & valid
    probs = jax.nn.softmax(logits, axis=-1)
    num_classes = logits.shape[-1]

    def per_class(c):
        fg = ((labels == c) & mask).astype(jnp.float32)
        err = jnp.where(mask, jnp.abs(fg - probs[:, c]), 0.0)
        order = jnp.argsort(-err)
        err_s = err[order]
        fg_s = fg[order]
        loss_c = jnp.sum(err_s * _lovasz_grad(fg_s))
        present = jnp.sum(fg) > 0
        return jnp.where(present, loss_c, 0.0), present.astype(jnp.float32)

    losses, present = jax.vmap(per_class)(jnp.arange(num_classes))
    return jnp.sum(losses) / jnp.maximum(jnp.sum(present), 1.0)


def segmentation_loss(logits, labels, valid=None, lovasz_weight: float = 0.0,
                      class_weights=None):
    loss = cross_entropy(logits, labels, valid, class_weights)
    if lovasz_weight > 0:
        loss = loss + lovasz_weight * lovasz_softmax(logits, labels, valid)
    return loss


def sqrt_inverse_class_weights(label_counts) -> "jnp.ndarray":
    """``1/sqrt(freq)`` normalized class weights
    (datasets/base_dataset.py:558-575)."""
    counts = jnp.maximum(jnp.asarray(label_counts, jnp.float32), 1.0)
    w = 1.0 / jnp.sqrt(counts / counts.sum())
    return w / w.mean()


def view_level_loss(view_logits, labels, point_id, view_valid):
    """Per-view NLL against the owning point's label — the reference's
    view-level loss option (labels repeat_interleave'd per view,
    models/segmentation/multimodal/no3d.py:139-155; needs
    ``keep_last_view=True`` branch extras)."""
    n = labels.shape[0]
    pid = jnp.minimum(point_id, n - 1)
    view_labels = jnp.where(view_valid, labels[pid], IGNORE_LABEL)
    return cross_entropy(view_logits, view_labels)


def propagate_unseen(logits, pos, x_seen, k: int = 1):
    """Eval-time semantics for points no view reaches: copy the (log-)probs
    of the nearest *seen* neighbor (KeOps 1-NN in the reference,
    no3d.py:105-126).  Host-side numpy/JAX; used by eval, not training."""
    import numpy as np

    from ..ops.knn import knn

    logits = np.asarray(logits)
    x_seen = np.asarray(x_seen)
    if x_seen.all() or not x_seen.any():
        return logits
    pos = np.asarray(pos)
    _, idx = knn(pos[~x_seen], pos, k=k, valid=x_seen)
    out = logits.copy()
    out[~x_seen] = logits[idx[:, 0]]
    return out
