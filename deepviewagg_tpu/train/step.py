"""Train / eval step builders.

The per-batch contract of the reference's ``BaseModel.optimize_parameters``
(models/base_model.py:241-267): forward under mixed precision, loss,
backward, clip, optimizer + scheduler updates — here one pure jitted function
over a TrainState.  bf16 matmuls with f32 params/accum replace AMP
(SURVEY.md §7 move 6); gradient accumulation is an optax wrapper
(``optax.MultiSteps``) applied by the caller when configured.

Steps optionally run under ``shard_map`` (see parallel.mesh): gradients and
metrics are pmean'd over the mesh axis when one is active.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..models.losses import segmentation_loss

__all__ = ["TrainState", "make_train_step", "make_eval_step"]


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: Any = struct.field(pytree_node=False)

    @classmethod
    def create(cls, variables, tx):
        params = variables["params"]
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(params),
            tx=tx,
        )


def _psum_available(axis: Optional[str]):
    return axis is not None


def make_train_step(
    model,
    lovasz_weight: float = 0.0,
    axis: Optional[str] = None,
    class_weights=None,
    ignore_unseen: Optional[bool] = None,
    view_loss_weight: float = 0.0,
) -> Callable:
    """Returns ``step(state, batch, rng) -> (state, metrics)``.

    ``axis``: mesh axis name when the step runs inside shard_map — gradients
    and new BN stats are pmean'd so every device applies identical updates.
    ``ignore_unseen``: mask points no view reaches out of the loss — the
    reference does this for the image-only No3D models (no3d.py:130-134),
    where unseen points carry no signal; defaults to True for No3DSeg.
    ``view_loss_weight``: adds the reference's view-level loss — per-view
    NLL against the owning point's label over the ``keep_last_view``
    tensors (no3d.py:139-155); needs a model emitting ``view_logits``.
    """
    if ignore_unseen is None:
        from ..models.segmentation import No3DSeg

        ignore_unseen = isinstance(model, No3DSeg)

    def step(state: TrainState, batch: Dict, rng) -> tuple:
        valid = batch["graph"]["levels"][0]["valid"]

        def loss_fn(params):
            out, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            loss_valid = valid
            if ignore_unseen and "x_seen" in out:
                loss_valid = loss_valid & out["x_seen"]
            loss = segmentation_loss(
                out["logits"], batch["labels"], loss_valid, lovasz_weight,
                class_weights,
            )
            if view_loss_weight > 0 and "view_logits" in out:
                from ..models.losses import view_level_loss

                ex = out["view_extras"]
                loss = loss + view_loss_weight * view_level_loss(
                    out["view_logits"], batch["labels"],
                    ex["view_point_id"], ex["view_valid"],
                )
            return loss, (updates["batch_stats"], out["logits"])

        (loss, (new_stats, logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)

        if _psum_available(axis):
            grads = jax.lax.pmean(grads, axis)
            new_stats = jax.lax.pmean(new_stats, axis)
            loss = jax.lax.pmean(loss, axis)

        updates, opt_state = state.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=params,
            batch_stats=new_stats,
            opt_state=opt_state,
        )
        metrics = {
            "loss": loss,
            "preds": jnp.argmax(logits, axis=-1),
            "grad_norm": optax_global_norm(grads),
        }
        return new_state, metrics

    return step


def optax_global_norm(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x)) for x in leaves))


def make_eval_step(model, axis: Optional[str] = None,
                   mc_dropout: bool = False) -> Callable:
    """``mc_dropout=True`` keeps dropout active at eval — the reference's
    ``enable_dropout_in_eval`` voting mode (base_model.py:480-487,
    trainer.py:230-258); pass a distinct rng per voting run."""

    def step(state: TrainState, batch: Dict, rng=None) -> Dict:
        rngs = {"dropout": rng} if (mc_dropout and rng is not None) else None
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch,
            train=False,
            rngs=rngs,
        )
        res = {
            "logits": out["logits"],
            "preds": jnp.argmax(out["logits"], axis=-1),
        }
        if "x_seen" in out:
            # surfaced so eval can copy nearest-seen logits onto unseen
            # points (no3d.py:105-126 propagate_unseen)
            res["x_seen"] = out["x_seen"]
        return res

    return step
