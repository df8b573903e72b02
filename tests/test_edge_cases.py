"""Edge cases: empty mappings, all-invalid segments, data-parallel trainer."""

import jax
import jax.numpy as jnp
import numpy as np

from deepviewagg_tpu.data.collate import device_view
from deepviewagg_tpu.data.toy import flagship_spec, toy_batch
from deepviewagg_tpu.models.segmentation import MultimodalSeg
import pytest

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the fast tier


def test_forward_with_no_valid_views():
    """A batch whose mapping has zero valid views must produce finite
    logits and an all-false x_seen (the reference's empty-modality /
    skipped-item path, modules.py:317-393)."""
    batch, _, _ = toy_batch(n_samples=1, density=25.0, image_size=(64, 32),
                            n_cameras=1)
    batch = device_view(batch)
    m = dict(batch["mappings"][0])
    m["view_valid"] = np.zeros_like(m["view_valid"])
    m["pix_valid"] = np.zeros_like(m["pix_valid"])
    m["point_id"] = np.full_like(m["point_id"], batch["feats"].shape[0])
    m["pix_view"] = np.full_like(m["pix_view"], len(m["view_valid"]))
    batch["mappings"] = {0: m}

    spec = flagship_spec(backbone="Res16UNetTest", tower="resnet18_l1",
                         num_groups=2)
    model = MultimodalSeg(spec)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    out, _ = model.apply(variables, batch, train=True,
                         mutable=["batch_stats"])
    assert np.isfinite(np.asarray(out["logits"])).all()
    assert not np.asarray(out["x_seen"]).any()


def test_data_parallel_trainer():
    """Trainer with data_parallel=True on the 8-device virtual mesh."""
    from deepviewagg_tpu.train.trainer import Trainer, TrainerConfig

    batch, _, _ = toy_batch(n_samples=1, density=25.0, image_size=(64, 32),
                            n_cameras=1)
    spec = flagship_spec(backbone="Res16UNetTest", tower="resnet18_l1",
                         num_groups=2)
    model = MultimodalSeg(spec)
    n_dev = len(jax.devices())
    cfg = TrainerConfig(epochs=1, base_lr=0.01, lr_schedule="constant",
                        data_parallel=True, track_every=1,
                        log_fn=lambda s: None)
    tr = Trainer(model, spec.num_classes, cfg,
                 example_batch=[batch] * n_dev)
    metrics = tr.fit(lambda: [[batch] * n_dev] * 2)
    assert np.isfinite(metrics["train_loss"])
    assert int(np.asarray(jax.device_get(tr.state.step)).max()) == 2