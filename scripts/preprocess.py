#!/usr/bin/env python
"""Standalone one-time dataset preprocessing (the reference's
``dataset.process()`` stage, SURVEY.md §3.4), separated from training so it
can run as a batch job (optionally sharded across hosts by index):

    python scripts/preprocess.py --dataset s3dis --root /data/s3dis \\
        --out /data/s3dis/processed_dva --voxel-size 0.05
    python scripts/preprocess.py --dataset kitti360 --root /data/kitti360 \\
        --shard 0 --num-shards 8        # one shard of the windows
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", required=True,
                   choices=["s3dis", "scannet", "kitti360", "synthetic"])
    p.add_argument("--root", required=True)
    p.add_argument("--out", default=None)
    p.add_argument("--voxel-size", type=float, default=0.05)
    p.add_argument("--image-size", type=int, nargs=2, default=None)
    p.add_argument("--keep-raw", action="store_true")
    p.add_argument("--shard", type=int, default=0)
    p.add_argument("--num-shards", type=int, default=1)
    args = p.parse_args()
    out = args.out or os.path.join(args.root, "processed_dva")

    if args.dataset == "s3dis":
        from deepviewagg_tpu.data.datasets.s3dis import preprocess_s3dis_area
        kw = {}
        if args.image_size:
            kw["image_size"] = tuple(args.image_size)
        areas = [a for a in range(1, 7)
                 if os.path.isdir(os.path.join(args.root, f"Area_{a}"))]
        for i, a in enumerate(areas):
            if i % args.num_shards != args.shard:
                continue
            print("area", a, "->",
                  preprocess_s3dis_area(args.root, a, out,
                                        voxel_size=args.voxel_size,
                                        keep_raw=args.keep_raw, **kw))
    elif args.dataset == "scannet":
        from deepviewagg_tpu.data.datasets.scannet import (
            preprocess_scannet_scan,
        )
        kw = {}
        if args.image_size:
            kw["image_size"] = tuple(args.image_size)
        scans = sorted(glob.glob(os.path.join(args.root, "scans", "scene*")))
        for i, s in enumerate(scans):
            if i % args.num_shards != args.shard:
                continue
            print(preprocess_scannet_scan(s, out,
                                          voxel_size=args.voxel_size, **kw))
    elif args.dataset == "kitti360":
        from deepviewagg_tpu.data.datasets.kitti360 import (
            preprocess_kitti360_window,
        )
        kw = {}
        if args.image_size:
            kw["image_size"] = tuple(args.image_size)
        plys = sorted(glob.glob(os.path.join(
            args.root, "data_3d_semantics", "*", "static", "*.ply")))
        for i, w in enumerate(plys):
            if i % args.num_shards != args.shard:
                continue
            print(preprocess_kitti360_window(args.root, w, out,
                                             voxel_size=args.voxel_size,
                                             **kw))
    else:
        from deepviewagg_tpu.data.datasets.synthetic_ds import (
            build_synthetic_cache,
        )
        print(build_synthetic_cache(out, keep_raw=args.keep_raw))


if __name__ == "__main__":
    main()
