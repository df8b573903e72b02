"""Lovász-softmax parity: our masked JAX formulation vs the reference's
``lovasz_softmax`` (metrics/lovasz_loss.py:155-215) executed on torch CPU.

Ours masks invalid rows with error exactly 0 (they sort to the tail and
contribute nothing); the reference filters them out before sorting — both
must give the same present-classes mean.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from deepviewagg_tpu.models.losses import IGNORE_LABEL, lovasz_softmax

from reference_shims import load_reference_module


@pytest.fixture(scope="module")
def ref_lovasz():
    return load_reference_module(
        "torch_points3d/metrics/lovasz_loss.py", "ref_lovasz"
    )


@pytest.mark.parametrize("seed,n,c,with_ignored,with_absent", [
    (0, 500, 6, False, False),
    (1, 500, 6, True, False),
    (2, 300, 9, True, True),
])
def test_lovasz_softmax_parity(ref_lovasz, seed, n, c, with_ignored,
                               with_absent):
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((n, c)).astype(np.float32)
    hi = c - 2 if with_absent else c        # leave classes absent from gt
    labels = rng.integers(0, hi, n).astype(np.int32)
    if with_ignored:
        labels[rng.random(n) < 0.2] = IGNORE_LABEL

    ours = float(lovasz_softmax(jnp.asarray(logits), jnp.asarray(labels)))

    probs = torch.softmax(torch.from_numpy(logits), dim=1)
    # flatten_probas (lovasz_loss.py:205) takes flat [P, C] probas and just
    # row-filters the ignore label
    lab = torch.from_numpy(labels.astype(np.int64))
    got = float(ref_lovasz.lovasz_softmax(
        probs, lab, classes="present",
        ignore=IGNORE_LABEL if with_ignored else None))

    assert ours == pytest.approx(got, abs=1e-5)
