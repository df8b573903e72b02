"""Optimizer / LR-schedule factories (optax).

Replaces the reference's torch.optim plumbing (models/base_model.py:281-378):
SGD+momentum with multi-step / poly / cosine / exponential LR schedules
(core/schedulers/lr_schedulers.py), gradient clipping, and **per-submodule
discriminative LR groups** (base_model.py:291-343) via ``optax.multi_transform``
keyed on top-level parameter collections.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import optax

__all__ = ["make_schedule", "make_optimizer"]


def make_schedule(
    kind: str = "multi_step",
    base_lr: float = 0.1,
    total_steps: int = 100_000,
    milestones: Sequence[int] = (),
    gamma: float = 0.3,
    power: float = 0.9,
    warmup_steps: int = 0,
):
    """The reference's scheduler family (lr_schedulers.py): multi_step /
    poly / cosine / exponential / constant, with optional linear warmup."""
    if kind == "multi_step":
        sched = optax.piecewise_constant_schedule(
            base_lr, {int(m): gamma for m in milestones}
        )
    elif kind == "poly":
        sched = optax.polynomial_schedule(
            base_lr, 0.0, power=power, transition_steps=total_steps
        )
    elif kind == "cosine":
        sched = optax.cosine_decay_schedule(base_lr, decay_steps=total_steps)
    elif kind == "exponential":
        sched = optax.exponential_decay(
            base_lr, transition_steps=max(total_steps // 30, 1), decay_rate=gamma
        )
    elif kind == "constant":
        sched = optax.constant_schedule(base_lr)
    else:
        raise ValueError(kind)
    if warmup_steps:
        warm = optax.linear_schedule(0.0, base_lr, warmup_steps)
        sched = optax.join_schedules([warm, sched], [warmup_steps])
    return sched


def make_optimizer(
    schedule,
    optimizer: str = "sgd",
    momentum: float = 0.9,
    weight_decay: float = 1e-4,
    grad_clip: Optional[float] = None,
    lr_scales: Optional[Dict[str, float]] = None,
    freeze_paths: Optional[Sequence[Sequence[str]]] = None,
):
    """``lr_scales`` maps top-level param-tree keys to LR multipliers — the
    discriminative-LR groups the reference builds from config
    (base_model.py:291-343, e.g. a lower LR on a pretrained 2D tower).

    ``freeze_paths``: param-tree path prefixes (e.g. ``[("branch_l0",
    "tower")]``) whose subtrees receive NO updates at all — not even weight
    decay, which would otherwise shrink frozen pretrained towers despite
    their zero gradients (ref 'frozen' tower option, modalities/image.py:737).
    """
    def base_tx(scale: float = 1.0):
        chain = []
        if grad_clip:
            chain.append(optax.clip_by_global_norm(grad_clip))
        if optimizer == "sgd":
            if weight_decay:
                chain.append(optax.add_decayed_weights(weight_decay))
            chain.append(optax.sgd(lambda s: schedule(s) * scale, momentum=momentum))
        elif optimizer == "adam":
            chain.append(optax.adam(lambda s: schedule(s) * scale))
        elif optimizer == "adamw":
            chain.append(
                optax.adamw(lambda s: schedule(s) * scale, weight_decay=weight_decay)
            )
        else:
            raise ValueError(optimizer)
        return optax.chain(*chain)

    if not lr_scales and not freeze_paths:
        return base_tx()

    transforms = {"__default__": base_tx(), "__frozen__": optax.set_to_zero()}
    for key, scale in (lr_scales or {}).items():
        transforms[key] = base_tx(scale)
    frozen = [tuple(p) for p in (freeze_paths or [])]

    def label_fn(params):
        def walk(node, prefix):
            if any(prefix[: len(fp)] == fp for fp in frozen):
                label = "__frozen__"
            elif lr_scales and prefix and prefix[0] in lr_scales:
                label = prefix[0]
            else:
                label = None
            if isinstance(node, dict):
                return {k: walk(v, prefix + (k,)) for k, v in node.items()}
            return label or "__default__"

        return walk(params, ())

    return optax.multi_transform(transforms, label_fn)
