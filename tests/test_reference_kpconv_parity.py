"""KPConv parity: our ``KPConvLayer`` vs the reference's ``KPConv_ops``
(modules/KPConv/convolution_ops.py:19-105) executed from /root/reference on
torch CPU with transplanted kernel weights and identical kernel-point
dispositions.

Padding conventions differ by design: the reference appends a shadow
support row at 1e6 (shadow neighbors index it, influence clamps to 0);
ours masks by ``nbr_count``.  With equivalent neighbor tables the outputs
must agree to bf16-matmul tolerance (our einsum runs bf16 operands with
f32 accumulation on the MXU).
"""

import numpy as np
import pytest
import torch

import jax

from deepviewagg_tpu.nn.kpconv import KPConvLayer, kernel_point_dispositions

from reference_shims import load_reference_module


@pytest.fixture(scope="module")
def ref_ops():
    return load_reference_module(
        "torch_points3d/modules/KPConv/convolution_ops.py", "ref_kpconv_ops"
    )


def test_kpconv_layer_matches_reference_ops(ref_ops):
    rng = np.random.default_rng(0)
    m, n_sup, k, cin, cout, n_kp = 40, 60, 8, 5, 7, 15
    radius = 0.3
    sigma = radius / 2.5

    query = rng.random((m, 3)).astype(np.float32)
    support = rng.random((n_sup, 3)).astype(np.float32) * 0.5
    feats = rng.standard_normal((n_sup, cin)).astype(np.float32)
    nbr_idx = rng.integers(0, n_sup, (m, k)).astype(np.int32)
    nbr_count = rng.integers(1, k + 1, m).astype(np.int32)

    layer = KPConvLayer(out_channels=cout, num_kernel_points=n_kp,
                        radius=radius)
    rel = support[nbr_idx] - query[:, None, :]
    valid = np.ones(m, bool)
    variables = layer.init(jax.random.PRNGKey(0), feats, rel, nbr_idx,
                           nbr_count, valid)
    ours = np.asarray(layer.apply(variables, feats, rel, nbr_idx,
                                  nbr_count, valid))

    # reference call: shadow-pad the slots beyond nbr_count
    slot = np.arange(k)[None, :]
    ref_idx = np.where(slot < nbr_count[:, None], nbr_idx, n_sup)
    kp = kernel_point_dispositions(n_kp, radius * 0.66)
    kv = np.asarray(variables["params"]["kernel"])
    got_ref = ref_ops.KPConv_ops(
        torch.from_numpy(query),
        torch.from_numpy(support),
        torch.from_numpy(ref_idx.astype(np.int64)),
        torch.from_numpy(feats),
        torch.from_numpy(np.array(kp)),
        torch.from_numpy(kv.copy()),
        KP_extent=sigma,
        KP_influence="linear",
        aggregation_mode="sum",
    ).numpy()

    scale = np.abs(got_ref).max()
    assert scale > 0
    np.testing.assert_allclose(ours, got_ref, atol=0.01 * scale, rtol=0.02)


def test_kpconv_closest_mode_diverges(ref_ops):
    """Sanity that the comparison is sensitive: the reference's 'closest'
    aggregation (one kernel point per neighbor) must NOT match our 'sum'
    formulation on the same inputs."""
    rng = np.random.default_rng(1)
    m, n_sup, k, cin, cout, n_kp = 20, 30, 6, 4, 5, 15
    radius = 0.3
    query = rng.random((m, 3)).astype(np.float32)
    support = rng.random((n_sup, 3)).astype(np.float32) * 0.5
    feats = rng.standard_normal((n_sup, cin)).astype(np.float32)
    nbr_idx = rng.integers(0, n_sup, (m, k)).astype(np.int32)
    nbr_count = np.full(m, k, np.int32)

    layer = KPConvLayer(out_channels=cout, num_kernel_points=n_kp,
                        radius=radius)
    rel = support[nbr_idx] - query[:, None, :]
    valid = np.ones(m, bool)
    variables = layer.init(jax.random.PRNGKey(0), feats, rel, nbr_idx,
                           nbr_count, valid)
    ours = np.asarray(layer.apply(variables, feats, rel, nbr_idx,
                                  nbr_count, valid))

    kp = kernel_point_dispositions(n_kp, radius * 0.66)
    kv = np.asarray(variables["params"]["kernel"])
    got_closest = ref_ops.KPConv_ops(
        torch.from_numpy(query), torch.from_numpy(support),
        torch.from_numpy(nbr_idx.astype(np.int64)), torch.from_numpy(feats),
        torch.from_numpy(np.array(kp)), torch.from_numpy(kv.copy()),
        KP_extent=radius / 2.5, KP_influence="linear",
        aggregation_mode="closest",
    ).numpy()
    assert np.abs(ours - got_closest).max() > 1e-3
