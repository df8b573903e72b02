#!/usr/bin/env python
"""End-to-end demo: build a synthetic multimodal scene, train the flagship
briefly, and export the interactive HTML viewer + PLY snapshot — the role of
the reference's synthetic / inference notebooks (SURVEY.md §4.2-4).

    DVA_PLATFORM=cpu python scripts/demo_synthetic.py --out /tmp/dva_demo
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("DVA_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["DVA_PLATFORM"])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/dva_demo")
    p.add_argument("--epochs", type=int, default=4)
    args = p.parse_args()

    import jax
    import numpy as np

    from deepviewagg_tpu.data.collate import device_view
    from deepviewagg_tpu.data.toy import flagship_spec, toy_batch
    from deepviewagg_tpu.models.segmentation import MultimodalSeg
    from deepviewagg_tpu.train.trainer import Trainer, TrainerConfig
    from deepviewagg_tpu.visualization import export_html, save_ply_snapshot

    os.makedirs(args.out, exist_ok=True)
    batch, bucket, samples = toy_batch(
        n_samples=2, density=100.0, image_size=(128, 64), n_cameras=2,
    )
    spec = flagship_spec(backbone="Res16UNetTest", tower="resnet18_l2",
                         num_groups=4)
    model = MultimodalSeg(spec)
    cfg = TrainerConfig(epochs=args.epochs, base_lr=0.05,
                        lr_schedule="constant", track_every=1,
                        run_dir=args.out)
    tr = Trainer(model, spec.num_classes, cfg, example_batch=batch)
    metrics = tr.fit(lambda: [batch] * 8, lambda: [batch])
    print({k: round(v, 2) for k, v in metrics.items()})

    out = tr._eval_step(tr.state, tr._strip_meta(batch))
    preds = np.asarray(out["preds"])
    n0 = len(samples[0].coords)
    s = samples[0]
    ply = os.path.join(args.out, "sample.ply")
    save_ply_snapshot(ply, s.pos, rgb=s.feats[:, :3], labels=s.labels,
                      preds=preds[:n0])
    html = export_html(
        os.path.join(args.out, "viewer.html"), s.pos, rgb=s.feats[:, :3],
        labels=s.labels, preds=preds[:n0], images=s.images,
        mapping=s.mapping, title="deepviewagg_tpu synthetic demo",
    )
    print("wrote", ply, "and", html)


if __name__ == "__main__":
    main()
