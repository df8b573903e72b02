#!/usr/bin/env python
"""Train a model: ``python train.py [--config conf/x.yaml] [k=v ...]``.

The reference's ``train.py`` (Hydra @main -> Trainer(cfg).train()); same
shape without the Hydra dependency:

    python train.py --config conf/synthetic.yaml \\
        model.name=Res16UNet34-L4-early training.epochs=5

Config groups (deepviewagg_tpu/config/run.py): model / data / training.
"""

from __future__ import annotations

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import argparse
import sys

# the axon TPU plugin overrides JAX_PLATFORMS from the environment;
# jax.config wins over both (e.g. DVA_PLATFORM=cpu for host-only smoke runs)
if os.environ.get("DVA_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["DVA_PLATFORM"])


def build_dataset(cfg, train: bool):
    # the reference evaluates under its own pixel budget
    # (test_pixel_credit -> data.eval_image_slots)
    if not train and cfg.data.eval_image_slots:
        import dataclasses as _dc

        cfg = _dc.replace(cfg, data=_dc.replace(
            cfg.data, image_slots=cfg.data.eval_image_slots))
    if cfg.data.dataset == "synthetic":
        from deepviewagg_tpu.data.datasets.synthetic_ds import (
            make_synthetic_dataset,
        )
        return make_synthetic_dataset(
            cfg.data.root, train=train, radius=cfg.data.radius,
            voxel_size=cfg.data.voxel_size, image_slots=cfg.data.image_slots,
            samples_per_epoch=cfg.data.samples_per_epoch,
            image_size=tuple(cfg.data.image_size), **cfg.data.kwargs,
        )
    if cfg.data.dataset == "s3dis":
        from deepviewagg_tpu.data.datasets.s3dis import make_s3dis_dataset
        return make_s3dis_dataset(
            cfg.data.root, train=train, radius=cfg.data.radius,
            voxel_size=cfg.data.voxel_size, image_slots=cfg.data.image_slots,
            samples_per_epoch=cfg.data.samples_per_epoch, **cfg.data.kwargs,
        )
    if cfg.data.dataset == "scannet":
        from deepviewagg_tpu.data.datasets.scannet import make_scannet_dataset
        return make_scannet_dataset(
            cfg.data.root, train=train, voxel_size=cfg.data.voxel_size,
            image_slots=cfg.data.image_slots, **cfg.data.kwargs,
        )
    if cfg.data.dataset == "kitti360":
        from deepviewagg_tpu.data.datasets.kitti360 import make_kitti360_dataset
        return make_kitti360_dataset(
            cfg.data.root, train=train, radius=cfg.data.radius,
            voxel_size=cfg.data.voxel_size, image_slots=cfg.data.image_slots,
            samples_per_epoch=cfg.data.samples_per_epoch, **cfg.data.kwargs,
        )
    raise KeyError(cfg.data.dataset)


def auto_bucket(cfg, dataset, branch_levels, probe: int = 8):
    """Measure capacities from a few samples when not pinned in config."""
    import numpy as np
    from deepviewagg_tpu.data.collate import Bucket
    from deepviewagg_tpu.ops import voxel as _voxel

    if cfg.data.level_caps:
        return Bucket(
            level_caps=list(cfg.data.level_caps),
            num_batches=cfg.data.batch_size,
            view_cap=cfg.data.view_cap, pix_cap=cfg.data.pix_cap,
            image_cap=cfg.data.image_cap,
            image_size=tuple(cfg.data.image_size),
        )
    sizes, views, pix = [], [], []
    bucket_pix = None      # per-ladder-bucket pixel/image maxima
    bucket_imgs = None
    ladder = None
    family_ladder = getattr(dataset, "image_families", None)
    if family_ladder:
        # camera-family buckets at native aspect (kitti360 pinhole+fisheye)
        ladder = [tuple(s_) for s_ in family_ladder]
        bucket_pix = [0] * len(ladder)
        bucket_imgs = [0] * len(ladder)
    elif cfg.data.crop_ladder_min > 0:
        from deepviewagg_tpu.data.crop_groups import crop_ladder

        ladder = crop_ladder(tuple(cfg.data.image_size),
                             min_size=cfg.data.crop_ladder_min)
        bucket_pix = [0] * len(ladder)
        bucket_imgs = [0] * len(ladder)
    counts_levels = None
    rng = np.random.default_rng(0)
    for _ in range(probe):
        s = dataset[int(rng.integers(len(dataset)))]
        if s is None:
            continue
        sizes.append(len(s.coords))
        if s.mapping is not None:
            views.append(s.mapping.num_views)
            pix.append(s.mapping.num_pixels)
            if ladder is not None and s.images is not None:
                from deepviewagg_tpu.data.crop_groups import (
                    assign_crop_groups, split_mapping_by_bucket,
                )

                if family_ladder and s.image_family is not None:
                    ass = {
                        "mapping": s.mapping, "images": s.images,
                        "image_bucket": np.asarray(s.image_family, np.int64),
                        "crop_origin": np.zeros(
                            (len(s.image_family), 2), np.int64),
                    }
                else:
                    ass = assign_crop_groups(
                        {"mapping": s.mapping, "images": s.images}, ladder
                    )
                mmp = split_mapping_by_bucket(ass, ladder,
                                              include_images=False)
                for bi, bk in enumerate(mmp["buckets"]):
                    bucket_pix[bi] = max(bucket_pix[bi], len(bk["pix_view"]))
                    bucket_imgs[bi] = max(
                        bucket_imgs[bi],
                        int((ass["image_bucket"] == bi).sum()),
                    )
        coords = np.concatenate(
            [np.zeros((len(s.coords), 1), np.int32), s.coords], axis=1
        )
        cur, stride, counts = coords, 1, [len(coords)]
        for _ in range(4):
            cur, _ = _voxel.downsample_coords(cur, stride * 2)
            stride *= 2
            counts.append(len(cur))
        counts = np.array(counts)
        counts_levels = counts if counts_levels is None else np.maximum(
            counts_levels, counts
        )
    b = cfg.data.batch_size
    margin = 1.3

    def cap(x, m=256):
        return int(-(-int(x * margin) // m) * m)

    ladder_icaps = None
    ladder_qcaps = None
    if ladder is not None and views:
        # measured per-bucket maxima from the probe; per-bucket distribution
        # varies a lot between samples, so use a generous margin (the
        # BatchLoader only enforces the GLOBAL pixel cap when grouping)
        ladder_icaps = [
            max(1, min(int(m * b) + 2, b * cfg.data.image_slots))
            for m in bucket_imgs
        ]
        ladder_qcaps = [max(cap(m * b * 2.5), 512) for m in bucket_pix]

    return Bucket(
        level_caps=[cap(c * b) for c in counts_levels],
        num_batches=b,
        view_cap=cap(max(views) * b) if views else 0,
        pix_cap=cap(max(pix) * b) if pix else 0,
        image_cap=b * cfg.data.image_slots,
        image_size=tuple(cfg.data.image_size),
        image_ladder=ladder,
        ladder_image_caps=ladder_icaps,
        ladder_pix_caps=ladder_qcaps,
    )


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default=None)
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    from deepviewagg_tpu.config import load_run_config, resolve_spec_from_cfg
    from deepviewagg_tpu.data.datasets.base import BatchLoader
    from deepviewagg_tpu.models.segmentation import build_model
    from deepviewagg_tpu.train.trainer import Trainer, TrainerConfig

    cfg = load_run_config(args.config, args.overrides)
    train_ds = build_dataset(cfg, train=True)
    val_ds = build_dataset(cfg, train=False)
    num_classes = getattr(train_ds, "num_classes", cfg.data.num_classes)

    spec = resolve_spec_from_cfg(cfg.model, num_classes)
    if cfg.training.view_parallel > 1 and any(
            b.tower_norm == "batch" for _, b in spec.branches):
        # flax nn.BatchNorm inside the towers computes per-shard statistics
        # (and would include zero-pad images), silently diverging from the
        # unsharded model — only GroupNorm towers shard exactly
        raise ValueError(
            "training.view_parallel requires GroupNorm towers "
            "(tower_norm='group'); BatchNorm statistics are per-model-shard "
            "under view sharding")
    variables_hook = None
    freeze_paths = None
    if cfg.model.tower_weights or cfg.model.tower_frozen:
        from deepviewagg_tpu.utils import pretrained as _pre

        # deep-stem sniffing lives in resolve_spec_from_cfg (shared with
        # eval/predict); persist the outcome so restores never depend on the
        # tower checkpoint file still existing
        if cfg.model.tower_weights and spec.branches:
            cfg.model.overrides.setdefault(
                "tower_deep_stem", spec.branches[0][1].tower_deep_stem)

        if cfg.model.tower_frozen:
            freeze_paths = _pre.freeze_paths_for_spec(spec)
        if cfg.model.tower_weights:
            def variables_hook(variables, _spec=spec):
                out = _pre.apply_tower_weights(
                    variables, _spec, cfg.model.tower_weights
                )
                print("loaded tower weights:",
                      _pre.tower_leaf_count(out, _spec))
                return out
    branch_levels = sorted(dict(spec.branches))
    bucket = auto_bucket(cfg, train_ds, branch_levels)
    print(f"bucket: levels={list(bucket.level_caps)} views={bucket.view_cap} "
          f"pix={bucket.pix_cap} imgs={bucket.image_cap}")

    model = build_model(spec)
    train_loader = BatchLoader(
        train_ds, bucket, cfg.data.batch_size, branch_levels, shuffle=True,
        seed=cfg.training.seed, conv0_kernel=spec.stem_kernel,
    )
    val_loader = BatchLoader(
        val_ds, bucket, cfg.data.batch_size, branch_levels, shuffle=False,
        conv0_kernel=spec.stem_kernel,
    )
    example = next(iter(train_loader))

    tcfg = TrainerConfig(
        epochs=cfg.training.epochs,
        eval_frequency=cfg.training.eval_frequency,
        lovasz_weight=cfg.training.lovasz_weight,
        view_loss_weight=cfg.training.view_loss_weight,
        base_lr=cfg.training.base_lr,
        lr_schedule=cfg.training.lr_schedule,
        lr_milestones=tuple(cfg.training.lr_milestones),
        lr_gamma=cfg.training.lr_gamma,
        optimizer=cfg.training.optimizer,
        momentum=cfg.training.momentum,
        weight_decay=cfg.training.weight_decay,
        grad_clip=cfg.training.grad_clip,
        grad_accumulate=cfg.training.grad_accumulate,
        freeze_paths=freeze_paths,
        run_dir=cfg.training.run_dir,
        num_batches_cap=cfg.training.num_batches_cap
        if not cfg.training.early_break else 2,
        data_parallel=cfg.training.data_parallel,
        view_parallel=cfg.training.view_parallel,
        tensorboard=cfg.training.tensorboard,
        wandb=cfg.training.wandb,
        wandb_project=cfg.training.wandb_project,
    )
    def chunk_per_device(loader):
        """data_parallel contract: each step consumes one bucket-shaped
        batch per DATA shard (trainer.py docstring) — with view_parallel,
        each data shard spans view_parallel devices sharing one batch.  The
        trailing remainder is DROPPED (drop_last semantics, logged) —
        repeating batches would give duplicated samples double gradient
        weight."""
        import jax

        n = len(jax.devices()) // max(1, cfg.training.view_parallel)

        def gen():
            buf = []
            yielded = 0
            for b in loader:
                buf.append(b)
                if len(buf) == n:
                    yield buf
                    yielded += 1
                    buf = []
            if buf:
                if yielded == 0:
                    # an epoch smaller than the device count would silently
                    # train ZERO steps under drop_last — that is a config
                    # error, not a remainder
                    raise ValueError(
                        f"data_parallel epoch produced {len(buf)} batch(es) "
                        f"for {n} devices — raise data.samples_per_epoch or "
                        f"shrink the mesh"
                    )
                print(f"data_parallel: dropped {len(buf)} trailing "
                      f"batch(es) short of the {n}-device step")
        return gen()

    if cfg.training.data_parallel:
        make_train = lambda: chunk_per_device(iter(train_loader))  # noqa: E731
        # eval consumes per-device batches sequentially through the
        # single-device eval step (Trainer.eval_epoch), so the val loader
        # stays unchunked — every eval sphere is scored, none duplicated
        make_val = lambda: iter(val_loader)                        # noqa: E731
        import jax

        example = [example] * len(jax.devices())  # init-only replication
    else:
        make_train = lambda: iter(train_loader)                    # noqa: E731
        make_val = lambda: iter(val_loader)                        # noqa: E731

    # pin the resolved stem kernel into the stored run config so restoring
    # this checkpoint can never rebuild a different stem shape even if the
    # zoo default changes again (it moved 5 -> 3 to match the reference's
    # multimodal configs)
    cfg.model.overrides.setdefault("stem_kernel", spec.stem_kernel)
    trainer = Trainer(model, num_classes, tcfg, example_batch=example,
                      seed=cfg.training.seed, run_config=cfg.to_dict(),
                      variables_hook=variables_hook)
    if cfg.training.resume and trainer.checkpoint and trainer.checkpoint.has("latest"):
        trainer.state = trainer.checkpoint.restore_state("latest", trainer.state)
        print("resumed from latest checkpoint")
    metrics = trainer.fit(make_train, make_val)
    print("final:", {k: round(v, 3) for k, v in metrics.items()})
    return metrics


if __name__ == "__main__":
    main()
