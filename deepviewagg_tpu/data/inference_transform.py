"""Run a trained model as a data transform (feature extraction).

TPU counterpart of the reference's ``ModelInference`` / ``PointNetForward``
(core/data_transform/inference_transforms.py:11-86): load a checkpointed
model from its run dir (the stored ``run.json`` is the source of truth,
like ``ModelCheckpoint.create_model``) and attach its per-point output to
the cloud under ``feat_name`` — e.g. to feed a second-stage model with
pretrained features.

Restricted to 3D-only backbones (the reference's only concrete subclass is
a PointNet forward); compiled programs are cached per capacity bucket so
repeated calls on similar-sized clouds reuse one XLA program.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import numpy as np

__all__ = ["ModelInference"]


def _round_pow2(n: int, minimum: int = 256) -> int:
    c = minimum
    while c < n:
        c *= 2
    return c


class ModelInference:
    """Attach a trained model's logits (or pre-head features) per point.

    Parameters mirror the reference: ``run_dir`` holding ``run.json`` +
    checkpoints, ``weight`` selecting ``latest`` / ``best_<metric>``,
    ``feat_name`` the output key, ``output`` one of ``"logits"`` /
    ``"probs"`` / ``"labels"``.
    """

    def __init__(self, run_dir: str, feat_name: str = "model_feat",
                 weight: str = "latest", output: str = "logits"):
        from ..config import load_run_config, resolve_spec_from_cfg
        from ..models.segmentation import build_model

        run_json = os.path.join(run_dir, "run.json")
        if not os.path.exists(run_json):
            raise FileNotFoundError(f"no run.json under {run_dir}")
        stored = json.load(open(run_json))
        self.cfg = load_run_config(None, [], base=stored)
        spec = resolve_spec_from_cfg(self.cfg.model, self.cfg.data.num_classes)
        if spec.branches:
            raise ValueError(
                "ModelInference supports 3D-only checkpoints (the reference's "
                "concrete subclass is a plain PointNet forward too)"
            )
        if spec.in_channels != 4:
            raise ValueError(
                f"checkpoint expects in_channels={spec.in_channels}; "
                "ModelInference builds the standard rgb+ones (4-channel) "
                "features only"
            )
        self.spec = spec
        self.model = build_model(spec)
        self.run_dir = run_dir
        self.weight = weight
        self.feat_name = feat_name
        self.output = output
        self._state = None      # restored lazily (first __call__)
        self._programs: Dict[int, object] = {}

    # -- checkpoint ---------------------------------------------------------
    def _variables(self, example_batch):
        if self._state is None:
            import jax

            from ..train.checkpoint import CheckpointManager

            variables = jax.jit(
                self.model.init, static_argnames=("train",)
            )(jax.random.PRNGKey(0), example_batch, train=False)
            ckpt = CheckpointManager(self.run_dir)
            # params-only restore: the stored opt_state depends on training
            # settings this transform neither knows nor needs
            self._state = ckpt.restore_variables(self.weight, variables)
        return self._state

    # -- forward ------------------------------------------------------------
    def __call__(self, cloud: dict, rng: Optional[np.random.Generator] = None):
        import jax

        from ..data.collate import Bucket, Sample, collate, device_view
        from ..data.transforms3d import quantize_cloud
        from ..ops import voxel as _voxel

        q = cloud if "coords" in cloud else quantize_cloud(
            cloud, self.cfg.data.voxel_size
        )
        n = len(q["coords"])
        rgb = q.get("rgb")
        if rgb is None:
            rgb = np.zeros((n, 3), np.float32)
        feats = np.concatenate(
            [np.asarray(rgb, np.float32), np.ones((n, 1), np.float32)], axis=1
        )
        cap0 = _round_pow2(n)
        caps = [cap0]
        cur = np.concatenate(
            [np.zeros((n, 1), np.int32), np.asarray(q["coords"], np.int32)],
            axis=1,
        )
        stride = 1
        for _ in range(4):
            cur, _ = _voxel.downsample_coords(cur, stride * 2)
            stride *= 2
            caps.append(_round_pow2(len(cur)))
        bucket = Bucket(level_caps=caps, num_batches=1)
        sample = Sample(coords=np.asarray(q["coords"], np.int32), feats=feats,
                       labels=np.zeros(n, np.int32))
        batch = device_view(collate([sample], bucket,
                                    conv0_kernel=self.spec.stem_kernel))
        variables = self._variables(batch)

        key = tuple(caps)
        prog = self._programs.get(key)
        if prog is None:
            prog = jax.jit(
                lambda v, b: self.model.apply(v, b, train=False)["logits"]
            )
            self._programs[key] = prog
        logits = np.asarray(prog(variables, batch))[:n]

        out = dict(q)
        if self.output == "labels":
            out[self.feat_name] = logits.argmax(1).astype(np.int32)
        elif self.output == "probs":
            e = np.exp(logits - logits.max(1, keepdims=True))
            out[self.feat_name] = (e / e.sum(1, keepdims=True)).astype(np.float32)
        else:
            out[self.feat_name] = logits.astype(np.float32)
        return out
