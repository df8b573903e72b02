"""The Trainer: epoch loop, eval, best-checkpointing, logging.

Orchestration layer (reference torch_points3d/trainer.py:34-290): epoch loop
over a host data source, jitted train/eval steps (single chip or a data mesh
via shard_map), tracker updates every N batches, per-eval-frequency val/test
epochs with optional voting, per-metric best checkpoints, and the debugging
hooks (early break / batch caps, conf/debugging).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import numpy as np

from ..metrics.tracker import SegmentationTracker
from ..parallel.mesh import data_parallel_step, make_mesh, replicate
from .checkpoint import CheckpointManager
from .optimizers import make_optimizer, make_schedule
from .step import TrainState, make_eval_step, make_train_step

__all__ = ["TrainerConfig", "Trainer"]


@dataclasses.dataclass
class TrainerConfig:
    epochs: int = 100
    eval_frequency: int = 1
    lovasz_weight: float = 0.0
    view_loss_weight: float = 0.0
    base_lr: float = 0.1
    lr_schedule: str = "multi_step"
    lr_milestones: tuple = ()
    lr_gamma: float = 0.3
    total_steps: int = 100_000
    optimizer: str = "sgd"
    momentum: float = 0.9
    weight_decay: float = 1e-4
    grad_clip: Optional[float] = 10.0
    grad_accumulate: int = 1
    lr_scales: Optional[Dict[str, float]] = None
    # param-path prefixes masked out of the optimizer (frozen towers)
    freeze_paths: Optional[tuple] = None
    run_dir: Optional[str] = None
    track_every: int = 10
    num_batches_cap: Optional[int] = None    # debugging.num_batches
    selection_metric: str = "val_miou"
    data_parallel: bool = False
    # view parallelism: shard the 2D towers' image axis over this many
    # devices per data shard (parallel/mesh.py hybrid_parallel_step);
    # requires data_parallel and n_devices % view_parallel == 0
    view_parallel: int = 1
    profile_epochs: tuple = ()               # epochs to capture jax traces
    class_weights: Optional[tuple] = None    # per-class CE weights
    visualize_every: int = 0                 # epochs between sample dumps
    nan_guard: bool = True        # abort + checkpoint on non-finite loss
    tensorboard: bool = True
    wandb: bool = False
    wandb_project: Optional[str] = None
    # BN momentum schedule {epoch: momentum} — the reference's bn_scheduler
    # (core/schedulers/bn_schedulers.py); each change costs one retrace
    bn_momentum_milestones: Optional[Dict[int, float]] = None
    log_fn: Callable[[str], None] = print


class Trainer:
    """``Trainer(model, num_classes, cfg).fit(train_data, val_data)``.

    ``train_data`` / ``val_data`` are callables returning an iterable of
    collated batches per epoch (the host input pipeline).  With
    ``cfg.data_parallel`` each element must be a *list* of per-device
    batches.
    """

    def __init__(self, model, num_classes: int, cfg: TrainerConfig,
                 example_batch=None, seed: int = 0, run_config=None,
                 variables_hook=None):
        """``variables_hook(variables) -> variables`` runs right after
        parameter init, before the optimizer state is built — the hook point
        for pretrained-tower overlays (utils/pretrained.py)."""
        self.model = model
        self.cfg = cfg
        self.num_classes = num_classes
        self.rng = jax.random.PRNGKey(seed)
        self.run_config = run_config

        if example_batch is None:
            raise ValueError("example_batch required to initialize parameters")
        self.rng, init_rng = jax.random.split(self.rng)
        init_batch = (example_batch[0]
                      if isinstance(example_batch, (list, tuple))
                      else example_batch)
        variables = jax.jit(model.init, static_argnames=("train",))(
            init_rng, self._strip_meta(init_batch), train=False
        )
        if variables_hook is not None:
            variables = variables_hook(jax.device_get(variables))
        schedule = make_schedule(
            cfg.lr_schedule, cfg.base_lr, cfg.total_steps,
            cfg.lr_milestones, cfg.lr_gamma,
        )
        tx = make_optimizer(
            schedule, cfg.optimizer, cfg.momentum, cfg.weight_decay,
            cfg.grad_clip, cfg.lr_scales, freeze_paths=cfg.freeze_paths,
        )
        if cfg.grad_accumulate > 1:
            import optax
            tx = optax.MultiSteps(tx, cfg.grad_accumulate)
        self.state = TrainState.create(variables, tx)

        self._hybrid = cfg.data_parallel and cfg.view_parallel > 1
        axis = (("data", "model") if self._hybrid
                else "data" if cfg.data_parallel else None)
        self._raw_train_step = make_train_step(
            model, cfg.lovasz_weight, axis=axis,
            class_weights=(None if cfg.class_weights is None
                           else list(cfg.class_weights)),
            view_loss_weight=cfg.view_loss_weight,
        )
        eval_step = make_eval_step(model)
        self._bn_momentum = None
        if self._hybrid:
            from ..parallel.mesh import make_hybrid_mesh

            self.mesh = make_hybrid_mesh(n_model=cfg.view_parallel)
            self.state = replicate(self.state, self.mesh)
        elif cfg.data_parallel:
            self.mesh = make_mesh()
            self.state = replicate(self.state, self.mesh)
        else:
            self.mesh = None
        self._train_step = self._build_train_step(None)
        self._eval_step = jax.jit(eval_step)

        self.checkpoint = (
            CheckpointManager(cfg.run_dir, run_config=run_config)
            if cfg.run_dir else None
        )
        from ..utils.logging import MetricLogger
        self.logger = MetricLogger(
            cfg.run_dir,
            use_tensorboard=getattr(cfg, "tensorboard", True),
            use_wandb=getattr(cfg, "wandb", False),
            wandb_kwargs=(
                {"project": cfg.wandb_project}
                if getattr(cfg, "wandb_project", None) else None
            ),
        )
        self.epoch = 0

    # ------------------------------------------------------------------
    def _build_train_step(self, bn_mom: Optional[float]):
        """(Re)build the jitted step; ``bn_mom`` overrides every
        MaskedBatchNorm momentum at trace time (bn scheduler)."""
        from ..nn.norm import bn_momentum as _bn_ctx

        raw = self._raw_train_step

        def wrapped(state, batch, rng):
            with _bn_ctx(bn_mom):
                return raw(state, batch, rng)

        if self._hybrid:
            from ..parallel.mesh import hybrid_parallel_step

            return hybrid_parallel_step(wrapped, self.mesh)
        if self.cfg.data_parallel:
            return data_parallel_step(wrapped, self.mesh)
        return jax.jit(wrapped, donate_argnums=(0,))

    def _maybe_update_bn_momentum(self):
        sched = self.cfg.bn_momentum_milestones
        if not sched:
            return
        current = None
        for ep in sorted(sched):
            if self.epoch >= ep:
                current = sched[ep]
        if current != self._bn_momentum:
            self._bn_momentum = current
            self._train_step = self._build_train_step(current)

    @staticmethod
    def _strip_meta(batch):
        """meta holds host-only objects (cloud keys, ragged origin ids) that
        must not enter jit."""
        if isinstance(batch, (list, tuple)):
            return [Trainer._strip_meta(b) for b in batch]
        return {k: v for k, v in batch.items() if k != "meta"}

    def train_epoch(self, batches: Iterable) -> Dict[str, float]:
        tracker = SegmentationTracker(self.num_classes, "train")
        t0 = time.time()
        n = 0
        prev_loss = None
        for i, batch in enumerate(batches):
            if self.cfg.num_batches_cap and i >= self.cfg.num_batches_cap:
                break
            self.rng, step_rng = jax.random.split(self.rng)
            self.state, metrics = self._train_step(
                self.state, self._strip_meta(batch), step_rng
            )
            n += 1
            # failure detection beyond the reference (SURVEY §5: it has
            # none): check the PREVIOUS step's loss — the read overlaps with
            # the current step's device execution, so training stays
            # pipelined and at most one poisoned update lands before abort
            if self.cfg.nan_guard and prev_loss is not None:
                self._check_finite(prev_loss, i - 1)
            prev_loss = metrics["loss"]
            if i % self.cfg.track_every == 0:
                self._track_train(tracker, batch, metrics)
        if self.cfg.nan_guard and prev_loss is not None:
            self._check_finite(prev_loss, n - 1)
        out = tracker.get_metrics()
        out["train_batches"] = n
        out["train_time_s"] = time.time() - t0
        return out

    def _check_finite(self, loss, step: int):
        if np.isfinite(float(np.asarray(loss).mean())):
            return
        if self.checkpoint is not None:
            self.checkpoint.save_state("crash", jax.device_get(self.state))
        raise FloatingPointError(
            f"non-finite loss at epoch {self.epoch} step {step} — state "
            "(one update past the first bad loss) saved as 'crash'; lower "
            "the lr or enable grad_clip"
        )

    def _track_train(self, tracker, batch, metrics):
        if isinstance(batch, (list, tuple)):  # per-device batches
            preds = np.asarray(metrics["preds"])
            for b, p in zip(batch, preds):
                tracker.track(
                    p, b["labels"], np.asarray(b["graph"]["levels"][0]["valid"]),
                    losses={"loss": float(np.asarray(metrics["loss"]).mean())},
                )
        else:
            tracker.track(
                np.asarray(metrics["preds"]), batch["labels"],
                np.asarray(batch["graph"]["levels"][0]["valid"]),
                losses={"loss": float(metrics["loss"])},
            )

    def _save_visuals(self, batch, preds):
        """Per-epoch sample dump (the reference Visualizer role,
        visualization/visualizer.py:10): one .ply with labels+preds."""
        if "pos" not in batch or self.cfg.run_dir is None:
            return
        import os

        from ..visualization import save_ply_snapshot

        n = batch["meta"]["num_valid"] if "meta" in batch else len(preds)
        save_ply_snapshot(
            os.path.join(self.cfg.run_dir, "viz",
                         f"epoch_{self.epoch}.ply"),
            np.asarray(batch["pos"])[:n],
            labels=np.asarray(batch["labels"])[:n],
            preds=np.asarray(preds)[:n],
        )

    def eval_epoch(self, batches: Iterable, stage: str = "val") -> Dict[str, float]:
        tracker = SegmentationTracker(self.num_classes, stage)
        visualized = self.cfg.visualize_every <= 0 or (
            self.epoch % self.cfg.visualize_every != 0
        )
        for i, batch in enumerate(batches):
            if self.cfg.num_batches_cap and i >= self.cfg.num_batches_cap:
                break
            if isinstance(batch, (list, tuple)):
                for b in batch:
                    out = self._eval_step(self.state, self._strip_meta(b))
                    tracker.track(
                        np.asarray(out["preds"]), b["labels"],
                        np.asarray(b["graph"]["levels"][0]["valid"]),
                    )
            else:
                out = self._eval_step(self.state, self._strip_meta(batch))
                tracker.track(
                    np.asarray(out["preds"]), batch["labels"],
                    np.asarray(batch["graph"]["levels"][0]["valid"]),
                )
                if not visualized:
                    self._save_visuals(batch, np.asarray(out["preds"]))
                    visualized = True
        return tracker.get_metrics()

    # ------------------------------------------------------------------
    def fit(self, train_data: Callable, val_data: Optional[Callable] = None,
            epochs: Optional[int] = None) -> Dict[str, float]:
        log = self.cfg.log_fn
        all_metrics: Dict[str, float] = {}
        for _ in range(epochs or self.cfg.epochs):
            self.epoch += 1
            self._maybe_update_bn_momentum()
            if self.epoch in self.cfg.profile_epochs and self.cfg.run_dir:
                # jax profiler trace (the reference's debugging.profiling
                # hook, trainer.py:281-290, upgraded to the XLA profiler)
                import jax.profiler as _prof
                with _prof.trace(f"{self.cfg.run_dir}/profile_ep{self.epoch}"):
                    m = self.train_epoch(train_data())
            else:
                m = self.train_epoch(train_data())
            all_metrics.update(m)
            log(f"epoch {self.epoch}: "
                + " ".join(f"{k}={v:.3f}" for k, v in m.items()))
            if val_data is not None and self.epoch % self.cfg.eval_frequency == 0:
                vm = self.eval_epoch(val_data(), "val")
                all_metrics.update(vm)
                log(f"epoch {self.epoch} [val]: "
                    + " ".join(f"{k}={v:.3f}" for k, v in vm.items()))
            self.logger.log(all_metrics, self.epoch)
            if self.checkpoint is not None:
                directions = {
                    k: SegmentationTracker.metric_direction(k)
                    for k in all_metrics
                    if k.endswith(("miou", "acc", "macc", "loss"))
                }
                self.checkpoint.save_best(
                    jax.device_get(self.state), all_metrics, directions
                )
        return all_metrics
