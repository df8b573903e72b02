"""Optimizer factories: schedules, discriminative LR groups, accumulation."""

import jax.numpy as jnp
import numpy as np
import optax

from deepviewagg_tpu.train.optimizers import make_optimizer, make_schedule


def test_multi_step_schedule():
    s = make_schedule("multi_step", base_lr=0.1, milestones=[10, 20],
                      gamma=0.5)
    assert abs(float(s(0)) - 0.1) < 1e-6
    assert abs(float(s(15)) - 0.05) < 1e-6
    assert abs(float(s(25)) - 0.025) < 1e-6


def test_poly_and_warmup():
    s = make_schedule("poly", base_lr=0.1, total_steps=100, warmup_steps=10)
    assert float(s(0)) == 0.0
    assert abs(float(s(10)) - 0.1) < 1e-6
    assert float(s(109)) < 0.01


def test_discriminative_lr_groups():
    """Pretrained-tower LR scaling (base_model.py:291-343)."""
    params = {"backbone": jnp.ones((4,)), "tower": jnp.ones((4,))}
    grads = {"backbone": jnp.ones((4,)), "tower": jnp.ones((4,))}
    tx = make_optimizer(
        make_schedule("constant", 0.1), momentum=0.0, weight_decay=0.0,
        lr_scales={"tower": 0.1},
    )
    st = tx.init(params)
    upd, _ = tx.update(grads, st, params)
    np.testing.assert_allclose(np.asarray(upd["backbone"]), -0.1, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(upd["tower"]), -0.01, rtol=1e-5)


def test_gradient_accumulation():
    params = {"w": jnp.zeros((2,))}
    tx = optax.MultiSteps(
        make_optimizer(make_schedule("constant", 1.0), momentum=0.0,
                       weight_decay=0.0),
        every_k_schedule=2,
    )
    st = tx.init(params)
    g = {"w": jnp.ones((2,))}
    upd1, st = tx.update(g, st, params)
    assert float(jnp.abs(upd1["w"]).max()) == 0.0   # accumulating
    upd2, st = tx.update(g, st, params)
    np.testing.assert_allclose(np.asarray(upd2["w"]), -1.0, rtol=1e-5)
