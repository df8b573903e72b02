#!/usr/bin/env python
"""Train a non-segmentation task head:

    python scripts/train_task.py --task classification [--root DIR]
        [--epochs N] [--batches N] [--lr F]

Tasks: classification (ModelNet layout or procedural shapes), detection
(VoteNet on box scenes), panoptic (semantics + instance offsets),
registration (fragment pairs, FCGF-style descriptors).  Each drives the
already-built heads (deepviewagg_tpu/models/) through TaskTrainer — the
role of the reference's per-task ``BaseModel`` trainers
(models/{classification,object_detection,panoptic,registration}/).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("DVA_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["DVA_PLATFORM"])


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--task", required=True,
                        choices=["classification", "detection", "panoptic",
                                 "registration"])
    parser.add_argument("--root", default=None,
                        help="dataset dir (omit for procedural data)")
    parser.add_argument("--epochs", type=int, default=1)
    parser.add_argument("--batches", type=int, default=4)
    parser.add_argument("--batch_size", type=int, default=2)
    parser.add_argument("--lr", type=float, default=3e-3)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    import numpy as np

    from deepviewagg_tpu.data.collate import Bucket
    from deepviewagg_tpu.data.datasets import tasks as T
    from deepviewagg_tpu.train import task_steps as S

    rng = np.random.default_rng(args.seed)

    if args.task == "classification":
        from deepviewagg_tpu.models.classification import SparseConv3dCls

        ds = T.make_classification_dataset(args.root, train=True)
        bucket = Bucket(level_caps=[2048, 2048, 1024, 512, 256],
                        num_batches=args.batch_size)
        model = SparseConv3dCls(num_classes=ds.num_classes,
                                num_batches=args.batch_size)
        step = S.make_classification_step(model)

        def make_batches():
            for i in range(args.batches):
                samples = [ds[int(rng.integers(len(ds)))]
                           for _ in range(args.batch_size)]
                yield T.collate_classification(samples, bucket)

    elif args.task == "detection":
        from deepviewagg_tpu.models.detection import VoteNetDet

        ds = T.make_detection_dataset(args.root, train=True)
        model = VoteNetDet(num_classes=ds.num_classes,
                           sa_channels=((16, 32), (32, 64)))
        step = S.make_detection_step(model)

        def make_batches():
            for i in range(args.batches):
                yield ds[i % len(ds)]

    elif args.task == "panoptic":
        from deepviewagg_tpu.models.panoptic import PanopticSeg

        ds = T.make_panoptic_dataset(args.root, train=True,
                                     voxel_size=0.15)
        bucket = Bucket(level_caps=[12288, 4096, 2048, 1024, 512],
                        num_batches=args.batch_size)
        model = PanopticSeg(num_classes=ds.num_classes)
        step = S.make_panoptic_step(model, num_instances=64)

        def make_batches():
            for i in range(args.batches):
                samples = [ds[int(rng.integers(len(ds)))]
                           for _ in range(args.batch_size)]
                yield T.collate_panoptic(samples, bucket)

    else:  # registration
        from deepviewagg_tpu.models.registration import RegistrationNet

        ds = T.make_registration_dataset(args.root, train=True)
        bucket = Bucket(level_caps=[4096, 2048, 1024, 512, 256],
                        num_batches=1)
        model = RegistrationNet(descriptor_dim=16, backbone="Res16UNetTest")
        step = S.make_registration_step(model)

        def make_batches():
            for i in range(args.batches):
                yield T.collate_registration(ds[i % len(ds)], bucket)

    trainer = S.TaskTrainer(model, step, base_lr=args.lr)
    first = next(iter(make_batches()))
    trainer.init(trainer._strip_meta(first), seed=args.seed)
    metrics = trainer.fit(make_batches, epochs=args.epochs)
    print("final:", {k: round(float(v), 4) for k, v in metrics.items()})
    return metrics


if __name__ == "__main__":
    main()
