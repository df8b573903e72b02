"""Trainer smoke: a few epochs on synthetic batches must learn + checkpoint.

The reference has no test suite; its de-facto integration check is "train a
model on a toy scene and watch the loss fall" (SURVEY.md §4).  Here that is
an automated test, plus metric/checkpoint/resume coverage.
"""

import numpy as np
import pytest

from deepviewagg_tpu.data.toy import flagship_spec, toy_batch
from deepviewagg_tpu.metrics.confusion import ConfusionMatrix
from deepviewagg_tpu.metrics.tracker import SegmentationTracker, VoteAccumulator
from deepviewagg_tpu.models.segmentation import MultimodalSeg
from deepviewagg_tpu.train.trainer import Trainer, TrainerConfig

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the fast tier


def test_confusion_matrix_golden():
    cm = ConfusionMatrix(3)
    cm.add([0, 1, 2, 2], [0, 1, 1, 2])
    assert cm.overall_accuracy() == 0.75
    iou, present = cm.per_class_iou()
    np.testing.assert_allclose(iou, [1.0, 0.5, 0.5])
    assert cm.miou() == pytest.approx(2 / 3)
    # ignore labels
    cm2 = ConfusionMatrix(3)
    cm2.add([0, 1], [0, -1])
    assert cm2.count == 1


def test_vote_accumulator_full_res():
    va = VoteAccumulator(2)
    vote_pos = np.array([[0.0, 0, 0], [1.0, 0, 0]], np.float32)
    raw_pos = np.array([[0.1, 0, 0], [0.9, 0, 0], [0.45, 0, 0]], np.float32)
    va.add("c", 2, [0, 1, 1], np.array([[5, 0], [0, 3], [0, 3]], np.float32))
    preds, mask = va.preds("c")
    assert mask.all() and preds.tolist() == [0, 1]
    full = va.full_res_preds("c", vote_pos, raw_pos)
    assert full.tolist() == [0, 1, 0]


@pytest.mark.slow
def test_trainer_learns_and_checkpoints(tmp_path):
    spec = flagship_spec(backbone="Res16UNetTest", tower="resnet18_l1",
                         num_groups=2)
    batch, bucket, _ = toy_batch(n_samples=1, density=40.0,
                                 image_size=(64, 32), n_cameras=1)
    model = MultimodalSeg(spec)
    cfg = TrainerConfig(
        epochs=3, base_lr=0.05, lr_schedule="constant", run_dir=str(tmp_path),
        track_every=1, grad_clip=10.0, log_fn=lambda s: None,
    )
    tr = Trainer(model, spec.num_classes, cfg, example_batch=batch)
    metrics = tr.fit(lambda: [batch] * 4, lambda: [batch])
    assert np.isfinite(metrics["train_loss"])
    assert metrics["val_miou"] >= 0
    assert tr.checkpoint.has("latest")
    assert tr.checkpoint.has("best_val_miou")

    # resume restores weights into a fresh trainer
    tr2 = Trainer(model, spec.num_classes, cfg, example_batch=batch)
    restored = tr2.checkpoint.restore_state("latest", tr2.state)
    assert int(np.asarray(restored.step)) == int(np.asarray(tr.state.step))
    # first-epoch loss of resumed trainer should roughly match trained loss
    tr2.state = restored
    m2 = tr2.eval_epoch([batch], "val")
    assert abs(m2["val_miou"] - metrics["val_miou"]) < 1e-3


def test_nan_guard_aborts_and_checkpoints(tmp_path):
    """Failure detection: a poisoned step must abort with a crash
    checkpoint rather than silently training on NaNs."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import pytest

    spec = flagship_spec(backbone="Res16UNetTest", tower="resnet18_l1",
                         num_groups=2)
    batch, _, _ = toy_batch(n_samples=1, density=40.0,
                            image_size=(64, 32), n_cameras=1)
    model = MultimodalSeg(spec)
    num_classes = spec.num_classes
    cfg = TrainerConfig(epochs=1, run_dir=str(tmp_path), base_lr=0.1,
                        track_every=1, log_fn=lambda s: None)
    trainer = Trainer(model, num_classes, cfg, example_batch=batch)
    # poison the parameters so the first tracked loss is NaN
    trainer.state = trainer.state.replace(
        params=jax.tree_util.tree_map(
            lambda x: jnp.full_like(x, jnp.nan), trainer.state.params
        )
    )
    with pytest.raises(FloatingPointError):
        trainer.train_epoch(iter([batch]))
    assert trainer.checkpoint.has("crash")
