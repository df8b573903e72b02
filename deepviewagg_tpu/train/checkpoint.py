"""Checkpointing: single-directory runs with per-metric best + latest.

The reference keeps one ``.pt`` holding the run config plus model weights
keyed ``best_<metric>`` / ``latest`` and optimizer/scheduler/tracker state
(metrics/model_checkpoint.py:21-391).  Here each key is one msgpack file
(flax.serialization) under the run dir, plus ``run.json`` with the config —
resume rebuilds the model from the stored config exactly like
``ModelCheckpoint.create_model`` (model_checkpoint.py:241-253).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional

import numpy as np
from flax import serialization

__all__ = ["CheckpointManager"]


class CheckpointManager:
    def __init__(self, run_dir: str, run_config: Optional[Dict] = None):
        self.run_dir = run_dir
        os.makedirs(run_dir, exist_ok=True)
        self._best: Dict[str, float] = {}
        cfg_path = os.path.join(run_dir, "run.json")
        if run_config is not None:
            # pin the stem kernel into every stored run config: absence is
            # how load_run_config identifies PRE-kernel-3-default runs (which
            # must restore under the old default 5), so a freshly written
            # run.json must always say which kernel it trained with
            model = run_config.get("model")
            if isinstance(model, dict):
                model.setdefault("overrides", {}).setdefault("stem_kernel", 3)
            with open(cfg_path, "w") as f:
                json.dump(run_config, f, indent=2, default=str)
        elif os.path.exists(cfg_path):
            pass
        best_path = os.path.join(run_dir, "best.json")
        if os.path.exists(best_path):
            self._best = json.load(open(best_path))

    # -- low level --------------------------------------------------------
    def _path(self, key: str) -> str:
        return os.path.join(self.run_dir, f"{key}.msgpack")

    def save_state(self, key: str, state) -> None:
        payload = {
            "step": state.step,
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
        }
        with open(self._path(key), "wb") as f:
            f.write(serialization.to_bytes(payload))

    def restore_state(self, key: str, state):
        """Restore into an existing (template) TrainState."""
        with open(self._path(key), "rb") as f:
            payload = serialization.from_bytes(
                {
                    "step": state.step,
                    "params": state.params,
                    "batch_stats": state.batch_stats,
                    "opt_state": state.opt_state,
                },
                f.read(),
            )
        return state.replace(**payload)

    def restore_variables(self, key: str, variables: Dict) -> Dict:
        """Restore only ``params``/``batch_stats`` against a template
        variables dict — inference-time loading that is independent of the
        optimizer the checkpoint was trained with (its opt_state pytree
        changes with grad_clip/accumulation settings)."""
        from flax import serialization as _ser

        with open(self._path(key), "rb") as f:
            raw = _ser.msgpack_restore(f.read())
        out = dict(variables)
        for part in ("params", "batch_stats"):
            if part in raw and variables.get(part) is not None:
                out[part] = _ser.from_state_dict(variables[part], raw[part])
        return out

    def has(self, key: str) -> bool:
        return os.path.exists(self._path(key))

    def load_run_config(self) -> Optional[Dict]:
        p = os.path.join(self.run_dir, "run.json")
        return json.load(open(p)) if os.path.exists(p) else None

    # -- best-model bookkeeping (model_checkpoint.py:311-380) -------------
    def save_best(self, state, metrics: Dict[str, float],
                  directions: Dict[str, str]) -> Dict[str, bool]:
        """Save 'latest' + any 'best_<metric>' that improved; returns which
        metrics improved."""
        self.save_state("latest", state)
        improved = {}
        for name, value in metrics.items():
            direction = directions.get(name)
            if direction is None:
                continue
            prev = self._best.get(name)
            better = (
                prev is None
                or (direction == "max" and value > prev)
                or (direction == "min" and value < prev)
            )
            if better:
                self._best[name] = float(value)
                self.save_state(f"best_{name}", state)
            improved[name] = better
        with open(os.path.join(self.run_dir, "best.json"), "w") as f:
            json.dump(self._best, f, indent=2)
        return improved

    @property
    def best_metrics(self) -> Dict[str, float]:
        return dict(self._best)
