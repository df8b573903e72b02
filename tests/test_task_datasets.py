"""Task dataset loaders (VERDICT r1 item #6): ModelNet OFF parsing,
procedural fallbacks, task collates, and one-step training per head."""

import os

import numpy as np
import pytest

from deepviewagg_tpu.data.collate import Bucket
from deepviewagg_tpu.data.datasets import tasks as T


def test_off_mesh_sampling(tmp_path):
    # unit right triangle in z=0 plus a far triangle with 100x area:
    # samples must be area-weighted toward the big one
    off = tmp_path / "m.off"
    off.write_text(
        "OFF\n6 2 0\n"
        "0 0 0\n1 0 0\n0 1 0\n"
        "10 10 10\n20 10 10\n10 20 10\n"
        "3 0 1 2\n3 3 4 5\n"
    )
    pts = T.sample_off_mesh(str(off), n_points=512, seed=0)
    assert pts.shape == (512, 3)
    far = (pts[:, 2] > 5).mean()
    assert far > 0.9   # 100:1 area ratio
    # points lie on the triangles (z is 0 or 10)
    assert np.all((np.abs(pts[:, 2]) < 1e-5) | (np.abs(pts[:, 2] - 10) < 1e-5))


def test_modelnet_layout_discovery(tmp_path):
    for cls in ("chair", "table"):
        for split in ("train", "test"):
            d = tmp_path / cls / split
            d.mkdir(parents=True)
            (d / "a.off").write_text(
                "OFF\n3 1 0\n0 0 0\n1 0 0\n0 1 0\n3 0 1 2\n"
            )
    ds = T.make_classification_dataset(str(tmp_path), train=True)
    assert ds.num_classes == 2 and len(ds) == 2
    s = ds[0]
    assert s.coords.dtype == np.int32 and len(s.feats) == len(s.coords)
    assert int(s.labels[0]) in (0, 1)


def test_classification_collate_has_sample_labels():
    ds = T.make_classification_dataset(None, train=True)
    samples = [ds[i] for i in range(3)]
    bucket = Bucket(level_caps=[4096, 2048, 1024, 512, 256], num_batches=4)
    batch = T.collate_classification(samples, bucket)
    assert batch["cls_label"].shape == (4,)
    assert (batch["cls_label"][:3] >= 0).all()
    assert batch["cls_label"][3] == -1      # empty slot ignored in the loss


def test_panoptic_instances_shift_across_samples():
    ds = T.make_panoptic_dataset(None, train=True, voxel_size=0.15)
    s0, s1 = ds[0], ds[1]
    assert (s0.instance >= -1).all() and s0.instance.max() >= 0
    bucket = Bucket(level_caps=[16384, 4096, 2048, 1024, 512], num_batches=2)
    batch = T.collate_panoptic([s0, s1], bucket)
    inst = batch["instance"]
    n0 = len(s0.coords)
    # second sample's ids are shifted past the first sample's
    first_max = int(s0.instance.max())
    second = inst[n0: n0 + len(s1.coords)]
    assert second[second >= 0].min() > first_max


def test_registration_pairs_correspond():
    ds = T.make_registration_dataset(None, train=True, n_points=512)
    item = ds[0]
    pairs = item["pairs"][: item["num_pairs"]]
    pa = item["frag_a"].pos[pairs[:, 0]]
    pb = item["frag_b"].pos[pairs[:, 1]]
    rt = item["transform"]
    moved = pa @ rt[:3, :3].T + rt[:3, 3]
    # voxel-level correspondences agree up to voxel size + noise
    err = np.linalg.norm(moved - pb, axis=1)
    assert np.median(err) < 0.2, float(np.median(err))


def test_detection_items_are_votenet_batches():
    ds = T.make_detection_dataset(None, train=True, n_points=1024,
                                  n_proposals=16)
    item = ds[0]
    assert item["gt_boxes"].shape == (8, 6)
    assert item["det_clusters"]["centers"].shape == (16,)
    assert item["feats"].shape[1] == 4


@pytest.mark.slow
def test_task_cli_smoke_epochs():
    """All four heads train one epoch through the CLI (loss finite)."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    import train_task

    for task in ("classification", "detection", "panoptic", "registration"):
        m = train_task.main(["--task", task, "--batches", "2",
                             "--epochs", "1"])
        assert np.isfinite(m["loss"]), task
