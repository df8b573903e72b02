"""Panoptic: offset loss + clustering recover synthetic box instances."""

import jax
import jax.numpy as jnp
import numpy as np

import pytest

from deepviewagg_tpu.models.panoptic import (
    PanopticSeg, cluster_instances, instance_loss,
)

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the fast tier


def test_cluster_instances_separates_boxes(rng):
    # two well-separated blobs of class 3, one stuff wall of class 2
    a = rng.normal(0, 0.1, (80, 3)) + [0, 0, 0]
    b = rng.normal(0, 0.1, (80, 3)) + [5, 0, 0]
    w = rng.normal(0, 0.1, (60, 3)) + [2.5, 3, 0]
    pos = np.concatenate([a, b, w]).astype(np.float32)
    sem = np.array([3] * 160 + [2] * 60)
    offsets = np.zeros_like(pos)   # already centered blobs
    ids = cluster_instances(pos, offsets, sem, thing_classes=[3],
                            cell=0.4, min_points=5)
    assert (ids[:160] >= 0).all()
    assert (ids[160:] == -1).all()
    assert len(np.unique(ids[:80])) == 1
    assert len(np.unique(ids[80:160])) == 1
    assert ids[0] != ids[100]


def test_instance_offset_loss(rng):
    pos = rng.normal(size=(100, 3)).astype(np.float32)
    inst = np.array([0] * 50 + [1] * 50, np.int32)
    cents = np.stack([pos[:50].mean(0), pos[50:].mean(0)])
    perfect = cents[inst] - pos
    assert float(instance_loss(jnp.asarray(perfect), pos, inst)) < 1e-5
    assert float(instance_loss(jnp.zeros_like(perfect), pos, inst)) > 0.1


def test_panoptic_forward(rng):
    from deepviewagg_tpu.data.collate import Bucket, Sample, collate, device_view

    n = 400
    coords = np.unique(rng.integers(0, 20, (n, 3)).astype(np.int32), axis=0)
    s = Sample(coords=coords,
               feats=rng.normal(size=(len(coords), 4)).astype(np.float32),
               labels=np.zeros(len(coords), np.int32))
    batch = device_view(collate(
        [s], Bucket(level_caps=[512, 512, 256, 128, 128], num_batches=1),
        conv0_kernel=3,
    ))
    model = PanopticSeg(num_classes=4)
    v = model.init(jax.random.PRNGKey(0), batch, train=False)
    out = model.apply(v, batch, train=False)
    assert out["logits"].shape[-1] == 4
    assert out["offsets"].shape[-1] == 3
    assert np.isfinite(np.asarray(out["offsets"])).all()


def test_panoptic_quality_golden():
    from deepviewagg_tpu.models.panoptic import panoptic_quality

    sem = np.array([3] * 10 + [3] * 10 + [2] * 10)
    inst = np.array([0] * 10 + [1] * 10 + [-1] * 10)
    perfect = panoptic_quality(sem, inst, sem, inst, num_classes=4,
                               thing_classes=[3])
    assert perfect["PQ"] > 0.99
    # merge the two instances into one prediction: one TP (iou .5 fails) ->
    # actually iou of merged vs each gt = 10/20 = 0.5 >= thresh for first
    merged = np.array([0] * 20 + [-1] * 10)
    m = panoptic_quality(sem, merged, sem, inst, num_classes=4,
                         thing_classes=[3])
    assert m["PQ"] < perfect["PQ"]
