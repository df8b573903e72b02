"""Class-weighted CE + sqrt-inverse-frequency weights."""

import jax.numpy as jnp
import numpy as np

from deepviewagg_tpu.models.losses import (
    cross_entropy, sqrt_inverse_class_weights,
)


def test_sqrt_inverse_weights():
    w = np.asarray(sqrt_inverse_class_weights([100, 100, 1]))
    assert w[2] > w[0] and abs(w.mean() - 1.0) < 1e-5


def test_weighted_ce_shifts_balance():
    logits = jnp.array([[2.0, 0.0], [0.0, 2.0], [2.0, 0.0]])
    labels = jnp.array([1, 1, 0])   # two wrong class-1, one right class-0
    base = float(cross_entropy(logits, labels))
    up1 = float(cross_entropy(logits, labels, class_weights=[0.1, 10.0]))
    assert up1 > base   # emphasizing the misclassified class raises loss
    dn1 = float(cross_entropy(logits, labels, class_weights=[10.0, 0.1]))
    assert dn1 < base
