#!/usr/bin/env python
"""Evaluate a checkpoint: ``python eval.py --run_dir runs/x [k=v ...]``.

The reference's ``eval.py`` (conf/eval.yaml -> Trainer.eval(): voting runs,
full-resolution tracker finalise, optional benchmark submission —
trainer.py:165-258).  Voting: ``--voting_runs N`` repeats the eval pass
(optionally with MC-dropout) accumulating logits per original point id.
"""

from __future__ import annotations

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import argparse
import json

if os.environ.get("DVA_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["DVA_PLATFORM"])


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default=None)
    parser.add_argument("--run_dir", required=True)
    parser.add_argument("--weight", default="latest",
                        help="latest or best_<metric>")
    parser.add_argument("--voting_runs", type=int, default=1)
    parser.add_argument("--full_res", action="store_true")
    parser.add_argument("--submission", default=None,
                        help="write a benchmark submission to this dir")
    parser.add_argument("--vote_ram_budget_mb", type=int, default=4096,
                        help="RAM cap for vote arrays; clouds past it spill "
                             "to memmap'd files (ref kitti360_tracker "
                             "tempdir votes)")
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    import numpy as np

    from deepviewagg_tpu.config import load_run_config, resolve_spec_from_cfg
    from deepviewagg_tpu.data.datasets.base import BatchLoader
    from deepviewagg_tpu.metrics.tracker import SegmentationTracker, VoteAccumulator
    from deepviewagg_tpu.models.segmentation import build_model
    from deepviewagg_tpu.train.trainer import Trainer, TrainerConfig
    from train import auto_bucket, build_dataset

    # the stored training config is the source of truth for model/data
    # shapes; --config and CLI overrides refine it (ref trainer.py:84)
    stored = None
    run_json = os.path.join(args.run_dir, "run.json")
    if os.path.exists(run_json):
        stored = json.load(open(run_json))
        print(f"restored run config from {run_json}")
    cfg = load_run_config(args.config, args.overrides, base=stored)
    val_ds = build_dataset(cfg, train=False)
    num_classes = getattr(val_ds, "num_classes", cfg.data.num_classes)
    spec = resolve_spec_from_cfg(cfg.model, num_classes)
    branch_levels = sorted(dict(spec.branches))
    bucket = auto_bucket(cfg, val_ds, branch_levels)
    model = build_model(spec)
    loader = BatchLoader(val_ds, bucket, cfg.data.batch_size, branch_levels,
                         shuffle=False, conv0_kernel=spec.stem_kernel)
    example = next(iter(loader))
    tcfg = TrainerConfig(run_dir=args.run_dir)
    trainer = Trainer(model, num_classes, tcfg, example_batch=example)
    trainer.state = trainer.checkpoint.restore_state(args.weight, trainer.state)

    import jax

    from deepviewagg_tpu.data.datasets.base import load_area
    from deepviewagg_tpu.train.step import make_eval_step

    tracker = SegmentationTracker(num_classes, "test")
    do_votes = args.voting_runs > 1 or args.full_res or args.submission
    votes = VoteAccumulator(
        num_classes, ram_budget_bytes=args.vote_ram_budget_mb << 20
    ) if do_votes else None
    cloud_sizes = {}   # avoid re-loading whole areas per sample

    def cloud_size(cloud):
        if cloud not in cloud_sizes:
            cloud_sizes[cloud] = len(load_area(cloud)["pos"])
        return cloud_sizes[cloud]
    mc_step = None
    if args.voting_runs > 1:
        mc_step = jax.jit(make_eval_step(model, mc_dropout=True))
    rng = jax.random.PRNGKey(0)
    for run in range(args.voting_runs):
        for batch in loader:
            dev_batch = trainer._strip_meta(batch)
            if run > 0 and mc_step is not None:
                rng, r = jax.random.split(rng)
                out = mc_step(trainer.state, dev_batch, r)
            else:
                out = trainer._eval_step(trainer.state, dev_batch)
            valid = np.asarray(batch["graph"]["levels"][0]["valid"])
            preds = np.asarray(out["preds"])
            logits = np.asarray(out["logits"])
            if spec.family == "no3d" and "x_seen" in out and "pos" in batch:
                # copy nearest-seen log-probs onto unseen points — the
                # reference's No3D eval semantics (no3d.py:105-126)
                from deepviewagg_tpu.models.losses import propagate_unseen

                logits = propagate_unseen(
                    logits, np.asarray(batch["pos"]),
                    np.asarray(out["x_seen"]) & valid)
                preds = logits.argmax(axis=-1)
            if run == 0:
                tracker.track(preds, batch["labels"], valid)
            if votes is not None:
                # per-sample vote accumulation keyed by original point ids
                start = 0
                meta = batch["meta"]
                for cloud, ids, size in zip(
                    meta["clouds"], meta["origin_ids"], meta["sizes"]
                ):
                    if cloud is None or ids is None:
                        start += size
                        continue
                    votes.add(cloud, cloud_size(cloud), ids,
                              logits[start:start + size])
                    start += size
    metrics = tracker.get_metrics()

    if votes is not None:
        vote_tracker = SegmentationTracker(num_classes, "vote")
        full_tracker = SegmentationTracker(num_classes, "full_res")
        any_full = False
        window_preds = {}
        for cloud in votes.clouds():
            area = load_area(cloud)
            preds, mask = votes.preds(cloud)
            if "labels" in area:
                vote_tracker.track(preds[mask], area["labels"][mask])
            name = os.path.splitext(os.path.basename(cloud))[0]
            if args.full_res and "raw_pos" in area:
                # 1-NN remap of votes onto the raw cloud (§A.9 voting)
                full = votes.full_res_preds(cloud, area["pos"],
                                            area["raw_pos"])
                window_preds[name] = full
                if "raw_labels" in area:
                    full_tracker.track(full, area["raw_labels"])
                    any_full = True
            else:
                window_preds[name] = preds
        metrics.update(vote_tracker.get_metrics())
        if any_full:
            metrics.update(full_tracker.get_metrics())
        if args.submission:
            if cfg.data.dataset == "kitti360":
                from deepviewagg_tpu.data.datasets.kitti360 import (
                    write_submission,
                )
                print("submission:", write_submission(args.submission,
                                                      window_preds))
            elif cfg.data.dataset == "scannet":
                from deepviewagg_tpu.data.datasets.scannet import (
                    write_submission,
                )
                print("submission:", write_submission(args.submission,
                                                      window_preds))
    print(json.dumps({k: round(v, 3) for k, v in metrics.items()}))
    return metrics


if __name__ == "__main__":
    main()
