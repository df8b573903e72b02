"""Classification head over the sparse encoder."""

import jax
import numpy as np

from deepviewagg_tpu.data.collate import Bucket, Sample, collate, device_view
from deepviewagg_tpu.models.classification import SparseConv3dCls
import pytest

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the fast tier


def test_classification_forward(rng):
    samples = []
    for b in range(2):
        n = 300
        coords = rng.integers(0, 24, (n, 3)).astype(np.int32)
        coords = np.unique(coords, axis=0)
        samples.append(Sample(
            coords=coords,
            feats=rng.normal(size=(len(coords), 4)).astype(np.float32),
            labels=np.zeros(len(coords), np.int32),
        ))
    bucket = Bucket(level_caps=[1024, 1024, 512, 256, 128], num_batches=2)
    batch = device_view(collate(samples, bucket, conv0_kernel=3))
    model = SparseConv3dCls(num_classes=10, num_batches=2)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    out = model.apply(variables, batch, train=False)
    assert out["logits"].shape == (2, 10)
    assert np.isfinite(np.asarray(out["logits"])).all()
