"""Train steps + a compact trainer for the non-segmentation tasks.

The reference routes every task through ``BaseModel`` subclasses with
task-specific ``set_input``/``forward``/losses and per-task trackers
(models/{classification,object_detection,panoptic,registration}/ +
metrics/).  Here each task is one pure jitted step over the shared
TrainState, and :class:`TaskTrainer` is the thin epoch loop driving it —
the heads, losses, and metrics already exist (models/, metrics/)."""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.losses import segmentation_loss
from .optimizers import make_optimizer, make_schedule
from .step import TrainState, optax_global_norm

__all__ = ["make_classification_step", "make_detection_step",
           "make_panoptic_step", "make_registration_step", "TaskTrainer"]


def _update(state: TrainState, grads, loss, extra: Dict) -> tuple:
    updates, opt_state = state.tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    new_state = state.replace(
        step=state.step + 1, params=params, opt_state=opt_state,
        batch_stats=extra.pop("batch_stats", state.batch_stats),
    )
    metrics = {"loss": loss, "grad_norm": optax_global_norm(grads), **extra}
    return new_state, metrics


def make_classification_step(model) -> Callable:
    """CE over per-sample logits (ref BackboneBasedModel classification,
    models/classification/)."""
    def step(state: TrainState, batch: Dict, rng) -> tuple:
        labels = batch["cls_label"]

        def loss_fn(params):
            out, upd = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                {k: v for k, v in batch.items() if k != "cls_label"},
                train=True, mutable=["batch_stats"], rngs={"dropout": rng},
            )
            logits = out["logits"]
            valid = labels >= 0
            logp = jax.nn.log_softmax(logits)
            ll = jnp.take_along_axis(
                logp, jnp.maximum(labels, 0)[:, None], axis=1
            )[:, 0]
            loss = -jnp.sum(jnp.where(valid, ll, 0.0)) / jnp.maximum(
                valid.sum(), 1
            )
            return loss, (upd["batch_stats"], logits)

        (loss, (stats, logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        acc = jnp.sum(
            (jnp.argmax(logits, -1) == batch["cls_label"])
            & (batch["cls_label"] >= 0)
        ) / jnp.maximum((batch["cls_label"] >= 0).sum(), 1)
        return _update(state, grads, loss,
                       {"batch_stats": stats, "acc": acc})

    return step


def make_detection_step(model) -> Callable:
    """VoteNet losses against the scene's padded GT boxes
    (models/detection.py votenet_loss; ref object detection API)."""
    from ..models.detection import votenet_loss

    def step(state: TrainState, batch: Dict, rng) -> tuple:
        gt = batch["gt_boxes"]

        def loss_fn(params):
            out, upd = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                {k: v for k, v in batch.items() if k != "gt_boxes"},
                train=True, mutable=["batch_stats"], rngs={"dropout": rng},
            )
            total, parts = votenet_loss(out, gt)
            return total, (upd["batch_stats"], parts)

        (loss, (stats, parts)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        extra = {"batch_stats": stats}
        extra.update({f"loss_{k}": v for k, v in parts.items()})
        return _update(state, grads, loss, extra)

    return step


def make_panoptic_step(model, num_instances: int = 64,
                       offset_weight: float = 1.0) -> Callable:
    """Semantic CE + PointGroup offset loss (models/panoptic.py; ref
    panoptic datasets carry per-point instance ids).  ``num_instances`` is
    the STATIC per-batch instance cap sizing the centroid table."""
    from ..models.panoptic import instance_loss

    def step(state: TrainState, batch: Dict, rng) -> tuple:
        valid = batch["graph"]["levels"][0]["valid"]
        inst = batch["instance"]
        n_inst = num_instances

        def loss_fn(params):
            out, upd = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                {k: v for k, v in batch.items() if k != "instance"},
                train=True, mutable=["batch_stats"], rngs={"dropout": rng},
            )
            sem = segmentation_loss(out["logits"], batch["labels"], valid)
            off = instance_loss(out["offsets"], batch["pos"], inst,
                                num_instances=n_inst, valid=valid)
            loss = sem + offset_weight * off
            return loss, (upd["batch_stats"], sem, off, out["logits"])

        (loss, (stats, sem, off, logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        return _update(state, grads, loss, {
            "batch_stats": stats, "loss_sem": sem, "loss_offset": off,
            "preds": jnp.argmax(logits, -1),
        })

    return step


def make_registration_step(model) -> Callable:
    """Shared-backbone descriptors on both fragments + hardest-contrastive
    over the GT correspondences (models/registration.py; ref 3DMatch API)."""
    from ..models.registration import hardest_contrastive

    def step(state: TrainState, batch: Dict, rng) -> tuple:
        pairs = batch["pairs"]

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            da, upd = model.apply(variables, batch["a"], train=True,
                                  mutable=["batch_stats"],
                                  rngs={"dropout": rng})
            # thread the a-pass running stats into the b pass so BatchNorm
            # accumulates from both fragments, not just fragment a
            db, upd = model.apply(
                {"params": params, "batch_stats": upd["batch_stats"]},
                batch["b"], train=True, mutable=["batch_stats"],
                rngs={"dropout": rng})
            valid_b = batch["b"]["graph"]["levels"][0]["valid"]
            loss = hardest_contrastive(da, db, pairs, valid_b=valid_b)
            return loss, (upd["batch_stats"], da, db)

        (loss, (stats, da, db)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        # feature-match quality: fraction of pairs whose descriptors are
        # mutual nearest (the reference's hit ratio / feat-match recall)
        d = jnp.linalg.norm(da[pairs[:, 0]] - db[pairs[:, 1]], axis=1)
        return _update(state, grads, loss, {
            "batch_stats": stats, "pair_dist": jnp.mean(d),
        })

    return step


@dataclasses.dataclass
class TaskTrainer:
    """Thin epoch loop for the task steps: jit once, iterate host batches,
    average metrics.  (The segmentation Trainer keeps its richer tracker /
    checkpoint machinery; these tasks reuse the optimizer factories.)"""

    model: object
    step_fn: Callable
    base_lr: float = 0.01
    optimizer: str = "adam"
    grad_clip: Optional[float] = 10.0
    log_fn: Callable[[str], None] = print

    def init(self, example_batch, seed: int = 0) -> TrainState:
        variables = jax.jit(
            self.model.init, static_argnames=("train",)
        )(jax.random.PRNGKey(seed), self._model_view(example_batch),
          train=False)
        tx = make_optimizer(make_schedule("constant", self.base_lr),
                            optimizer=self.optimizer, weight_decay=0.0,
                            grad_clip=self.grad_clip)
        self.state = TrainState.create(variables, tx)
        self._jitted = jax.jit(self.step_fn, donate_argnums=(0,))
        self.rng = jax.random.PRNGKey(seed + 1)
        return self.state

    @staticmethod
    def _model_view(batch):
        drop = ("cls_label", "gt_boxes", "instance", "meta")
        if "a" in batch and "b" in batch:   # registration pair
            return batch["a"]
        return {k: v for k, v in batch.items() if k not in drop}

    @staticmethod
    def _strip_meta(batch):
        return {k: v for k, v in batch.items() if k != "meta"}

    def train_epoch(self, batches: Iterable) -> Dict[str, float]:
        sums: Dict[str, float] = {}
        n = 0
        t0 = time.time()
        for batch in batches:
            self.rng, r = jax.random.split(self.rng)
            self.state, metrics = self._jitted(
                self.state, self._strip_meta(batch), r
            )
            n += 1
            for k, v in metrics.items():
                arr = np.asarray(v)
                if arr.ndim == 0:
                    sums[k] = sums.get(k, 0.0) + float(arr)
        out = {k: v / max(n, 1) for k, v in sums.items()}
        out["batches"] = n
        out["time_s"] = time.time() - t0
        return out

    def fit(self, make_batches: Callable, epochs: int = 1) -> Dict[str, float]:
        metrics: Dict[str, float] = {}
        for ep in range(1, epochs + 1):
            metrics = self.train_epoch(make_batches())
            self.log_fn(
                f"epoch {ep}: " + " ".join(
                    f"{k}={v:.4f}" for k, v in metrics.items()
                )
            )
        return metrics
