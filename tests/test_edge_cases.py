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

def test_vote_accumulator_out_of_core_spill():
    """Past the RAM budget, vote arrays live in memmap'd files and produce
    IDENTICAL predictions (VERDICT r2 #5; ref kitti360_tracker.py:110-154
    tempdir vote files)."""
    import os

    import numpy as np

    from deepviewagg_tpu.metrics.tracker import VoteAccumulator

    rng = np.random.default_rng(0)
    C, size, n_clouds = 5, 400, 6
    per_cloud = size * (4 * C + 4)
    ram = VoteAccumulator(C)                                 # unbounded
    ooc = VoteAccumulator(C, ram_budget_bytes=2 * per_cloud)  # ~2 clouds
    adds = []
    for ci in range(n_clouds):
        for _ in range(3):
            ids = rng.integers(0, size, 150)
            logits = rng.normal(size=(150, C)).astype(np.float32)
            adds.append((f"cloud{ci}", ids, logits))
    for name, ids, logits in adds:
        ram.add(name, size, ids, logits)
        ooc.add(name, size, ids, logits)
    assert ooc.spilled >= n_clouds - 2, "spill never engaged"
    spill_files = os.listdir(ooc._tempdir.name)
    assert any(f.endswith("_votes.npy") for f in spill_files)
    for ci in range(n_clouds):
        p1, m1 = ram.preds(f"cloud{ci}")
        p2, m2 = ooc.preds(f"cloud{ci}")
        np.testing.assert_array_equal(p1, p2)
        np.testing.assert_array_equal(m1, m2)
    # full-res remap path identical too
    vote_pos = rng.random((size, 3)).astype(np.float32)
    raw_pos = rng.random((900, 3)).astype(np.float32)
    np.testing.assert_array_equal(
        ram.full_res_preds("cloud0", vote_pos, raw_pos),
        ooc.full_res_preds("cloud0", vote_pos, raw_pos),
    )
