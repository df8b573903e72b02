"""View-level loss + unseen propagation wired end-to-end (VERDICT r2 #8;
ref no3d.py:105-155)."""

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.slow  # trains a no3d model; compile-heavy

from deepviewagg_tpu.data.toy import toy_batch
from deepviewagg_tpu.models.segmentation import ModelSpec, BranchSpec, build_model
from deepviewagg_tpu.train.optimizers import make_optimizer, make_schedule
from deepviewagg_tpu.train.step import (TrainState, make_eval_step,
                                        make_train_step)


def _no3d_model(num_classes=6):
    spec = ModelSpec(
        num_classes=num_classes, in_channels=4, family="no3d",
        branches=((0, BranchSpec(tower="unet2d_16", out_channels=16,
                                 atomic_reduce="max", view_pool="mean",
                                 interpolate=True)),),
    )
    return build_model(spec)


def test_view_loss_trains_no3d():
    """make_train_step(view_loss_weight>0) consumes the model's view_logits
    and the combined loss decreases over a few steps."""
    model = _no3d_model()
    batch, _, _ = toy_batch(n_samples=1, density=25.0, image_size=(64, 32),
                            n_cameras=1)
    batch = {k: v for k, v in batch.items() if k != "meta"}
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    out = model.apply(variables, batch, train=False)
    assert "view_logits" in out, "no3d model must emit per-view logits"
    assert out["view_logits"].shape[0] == \
        out["view_extras"]["view_point_id"].shape[0]

    tx = make_optimizer(make_schedule("constant", 0.05))
    state = TrainState.create(variables, tx)
    step = jax.jit(make_train_step(model, view_loss_weight=0.5))
    losses = []
    for i in range(6):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses

    # the view loss actually contributes: weighted step loss > plain loss
    plain = jax.jit(make_train_step(model))
    state2 = TrainState.create(variables, tx)
    _, m_plain = plain(state2, batch, jax.random.PRNGKey(0))
    state3 = TrainState.create(variables, tx)
    _, m_view = jax.jit(make_train_step(model, view_loss_weight=0.5))(
        state3, batch, jax.random.PRNGKey(0))
    assert float(m_view["loss"]) != float(m_plain["loss"])


def test_eval_step_surfaces_x_seen_and_propagation_copies():
    model = _no3d_model()
    batch, _, _ = toy_batch(n_samples=1, density=25.0, image_size=(64, 32),
                            n_cameras=1)
    batch = {k: v for k, v in batch.items() if k != "meta"}
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    state = TrainState.create(variables,
                              make_optimizer(make_schedule("constant", 0.1)))
    out = jax.jit(make_eval_step(model))(state, batch)
    assert "x_seen" in out

    from deepviewagg_tpu.models.losses import propagate_unseen

    logits = np.asarray(out["logits"])
    seen = np.asarray(out["x_seen"])
    valid = np.asarray(batch["graph"]["levels"][0]["valid"])
    seen = seen & valid
    if seen.all() or not seen.any():
        import pytest

        pytest.skip("toy batch left no unseen/seen split")
    pos = np.asarray(batch["pos"]) if "pos" in batch else None
    if pos is None:
        import pytest

        pytest.skip("toy batch has no positions")
    prop = propagate_unseen(logits, pos, seen)
    # seen rows untouched; every unseen row equals SOME seen row's logits
    np.testing.assert_array_equal(prop[seen], logits[seen])
    seen_rows = logits[seen]
    for row in prop[~seen & valid][:20]:
        assert (np.abs(seen_rows - row).sum(axis=1) < 1e-6).any()
