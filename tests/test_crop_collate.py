"""Crop-group collate path: Bucket.image_ladder -> MultimodalSeg forward."""

import jax
import numpy as np

from deepviewagg_tpu.data.collate import Bucket, collate, device_view
from deepviewagg_tpu.data.toy import flagship_spec, toy_samples
from deepviewagg_tpu.models.segmentation import MultimodalSeg
from deepviewagg_tpu.ops import voxel as _voxel
import pytest

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the fast tier


def test_collate_with_image_ladder():
    samples = toy_samples(2, 30.0, (64, 32), 1, 0.15, 0)
    views = sum(s.mapping.num_views for s in samples)
    pix = sum(s.mapping.num_pixels for s in samples)
    coords = np.concatenate([
        np.concatenate([np.full((len(s.coords), 1), b, np.int32),
                        s.coords], 1) for b, s in enumerate(samples)
    ])
    counts, cur, stride = [len(coords)], coords, 1
    for _ in range(4):
        cur, _ = _voxel.downsample_coords(cur, stride * 2)
        stride *= 2
        counts.append(len(cur))
    cap = lambda x, m=64: int(-(-int(x * 1.2) // m) * m)  # noqa: E731
    ladder = [(32, 16), (64, 32)]
    bucket = Bucket(
        level_caps=[cap(c) for c in counts], num_batches=2,
        view_cap=cap(views), pix_cap=cap(pix),
        image_ladder=ladder,
        ladder_image_caps=[4, 4],
        ladder_pix_caps=[cap(pix), cap(pix)],
    )
    batch = collate(samples, bucket, branch_levels=[0, 1])
    mm = batch["mappings"][0]
    assert "buckets" in mm and len(mm["buckets"]) == 2
    total_pix_valid = sum(int(b["pix_valid"].sum()) for b in mm["buckets"])
    assert total_pix_valid == pix
    # image crops are shared across fusion levels (built once)
    assert len(batch["bucket_images"]) == 2
    for img, icap in zip(batch["bucket_images"], bucket.ladder_image_caps):
        assert img.shape[0] == icap
    assert all("images" not in b for b in mm["buckets"])
    assert all("images" not in b for b in batch["mappings"][1]["buckets"])

    spec = flagship_spec(backbone="Res16UNetTest", tower="resnet18_l1",
                         num_groups=2)
    model = MultimodalSeg(spec)
    dev = device_view(batch)
    variables = model.init(jax.random.PRNGKey(0), dev, train=False)
    out, _ = model.apply(variables, dev, train=True, mutable=["batch_stats"])
    n = batch["meta"]["num_valid"]
    assert np.isfinite(np.asarray(out["logits"][:n])).all()
    assert np.asarray(out["x_seen"][:n]).any()
