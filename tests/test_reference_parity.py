"""Numerical parity against the ACTUAL reference modules (VERDICT r2 #1).

Loads ``/root/reference/torch_points3d/modules/multimodal/{pooling,fusion}.py``
on torch-CPU with exact torch_scatter shims (tests/reference_shims.py),
transplants identical weights into this repo's flax modules, and asserts the
attention/fusion math matches to <=1e-5 on random ragged inputs — including
empty segments (unseen points) and uneven channel groups.
"""

from __future__ import annotations

import numpy as np
import pytest
import torch

import jax.numpy as jnp
from flax.core import unfreeze

from deepviewagg_tpu.modules.fusion import BimodalFusion
from deepviewagg_tpu.modules.pooling import (
    DeepSetFeat,
    GroupViewPool,
    HeuristicPool,
    QKVViewPool,
    SegmentPool,
    expand_group_feat,
)
from deepviewagg_tpu.ops import segment as seg

from reference_shims import (
    copy_deepset,
    copy_torch_mlp,
    load_reference_fusion,
    load_reference_pooling,
    randomize_torch_module,
    t2j,
)

TOL = dict(rtol=1e-5, atol=1e-5)


@pytest.fixture(scope="module")
def refp():
    return load_reference_pooling()


@pytest.fixture(scope="module")
def reff():
    return load_reference_fusion()


def make_csr(rng, n_points=40, max_views=6, empty_every=5):
    """Ragged CSR with deliberate empty segments (unseen points)."""
    sizes = rng.integers(1, max_views + 1, n_points)
    sizes[::empty_every] = 0
    ptr = np.concatenate([[0], np.cumsum(sizes)])
    ids = np.repeat(np.arange(n_points), sizes)
    return ptr.astype(np.int64), ids.astype(np.int32), int(ptr[-1])


def _np(x):
    return np.asarray(x)


# ----------------------------------------------------------- raw ops -------
@pytest.mark.parametrize("reduce", ["max", "mean", "min", "sum"])
def test_segment_reduce_matches_segment_csr(rng, reduce):
    ptr, ids, V = make_csr(rng)
    x = rng.normal(size=(V, 7)).astype(np.float32)
    from reference_shims import segment_csr

    ref = segment_csr(torch.from_numpy(x), torch.from_numpy(ptr),
                      reduce=reduce).numpy()
    mine = _np(seg.segment_reduce(jnp.asarray(x), jnp.asarray(ids),
                                  len(ptr) - 1, reduce))
    np.testing.assert_allclose(mine, ref, **TOL)


@pytest.mark.parametrize("scaling", [False, True])
def test_segment_softmax_matches_reference(rng, refp, scaling):
    ptr, ids, V = make_csr(rng)
    x = rng.normal(size=(V, 4)).astype(np.float32) * 3.0
    ref = refp.segment_softmax_csr(
        torch.from_numpy(x), torch.from_numpy(ptr), scaling=scaling
    ).detach().numpy()
    mine = _np(seg.segment_softmax(jnp.asarray(x), jnp.asarray(ids),
                                   len(ptr) - 1, scaling=scaling))
    np.testing.assert_allclose(mine, ref, **TOL)


@pytest.mark.parametrize("groups,channels", [(1, 5), (4, 10), (8, 26)])
def test_expand_group_feat_matches_reference(rng, refp, groups, channels):
    a = rng.normal(size=(9, groups)).astype(np.float32)
    ref = refp.expand_group_feat(torch.from_numpy(a), groups, channels).numpy()
    mine = _np(expand_group_feat(jnp.asarray(a), groups, channels))
    np.testing.assert_allclose(mine, ref.reshape(mine.shape), **TOL)


# ------------------------------------------------------ pooling modules ----
def run_flax(module, variables, args, train):
    if train:
        out, _ = module.apply(variables, *args, train=True,
                              mutable=["batch_stats"])
        return out
    return module.apply(variables, *args, train=False)


@pytest.mark.parametrize("reduce", ["max", "mean", "min", "sum"])
def test_bimodal_csr_pool_parity(rng, refp, reduce):
    ptr, ids, V = make_csr(rng)
    x = rng.normal(size=(V, 6)).astype(np.float32)
    ref_mod = refp.BimodalCSRPool(mode=reduce)
    ref = ref_mod(None, torch.from_numpy(x), None,
                  torch.from_numpy(ptr)).numpy()
    pool = SegmentPool(reduce)
    vars_ = pool.init(__import__("jax").random.PRNGKey(0), jnp.asarray(x),
                      jnp.asarray(ids), None, len(ptr) - 1)
    mine = _np(pool.apply(vars_, jnp.asarray(x), jnp.asarray(ids), None,
                          len(ptr) - 1))
    np.testing.assert_allclose(mine, ref, **TOL)


@pytest.mark.parametrize("mode,feat", [("max", 3), ("min", 0)])
def test_heuristic_pool_parity(rng, refp, mode, feat):
    ptr, ids, V = make_csr(rng)
    x_mod = rng.normal(size=(V, 6)).astype(np.float32)
    x_map = rng.normal(size=(V, 8)).astype(np.float32)
    ref = refp.HeuristicBimodalCSRPool(mode=mode, feat=feat)(
        None, torch.from_numpy(x_mod), torch.from_numpy(x_map),
        torch.from_numpy(ptr)).numpy()
    feat_name = [k for k, v in
                 __import__("deepviewagg_tpu.modules.pooling",
                            fromlist=["VIEW_FEATURE_INDEX"])
                 .VIEW_FEATURE_INDEX.items() if v == feat][0]
    pool = HeuristicPool(feature=feat_name,
                         mode="argmax" if mode == "max" else "argmin")
    import jax

    vars_ = pool.init(jax.random.PRNGKey(0), jnp.asarray(x_mod),
                      jnp.asarray(x_map), jnp.asarray(ids), None, len(ptr) - 1)
    mine = _np(pool.apply(vars_, jnp.asarray(x_mod), jnp.asarray(x_map),
                          jnp.asarray(ids), None, len(ptr) - 1))
    np.testing.assert_allclose(mine, ref, **TOL)


@pytest.mark.parametrize("train", [False, True])
@pytest.mark.parametrize("pool_modes", ["max", "max_mean"])
def test_deepset_feat_parity(rng, refp, train, pool_modes):
    ptr, ids, V = make_csr(rng)
    x = rng.normal(size=(V, 8)).astype(np.float32)
    ref_mod = refp.DeepSetFeat(8, 32, pool=pool_modes,
                               fusion="concatenation", use_num=True)
    randomize_torch_module(ref_mod, seed=3)
    ref_mod.train(train)
    ref = ref_mod(torch.from_numpy(x),
                  torch.from_numpy(ptr)).detach().numpy()

    import jax

    mine_mod = DeepSetFeat(32, pool_modes=tuple(pool_modes.split("_")),
                           fusion="concatenation", use_num=True)
    variables = unfreeze(mine_mod.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(ids), None,
        len(ptr) - 1))
    sd = ref_mod.state_dict()
    for part in ("mlp_elt_1", "mlp_set", "mlp_elt_2"):
        copy_torch_mlp(sd, part, variables["params"][part],
                       variables["batch_stats"][part])
    mine = _np(run_flax(mine_mod, variables,
                        (jnp.asarray(x), jnp.asarray(ids), None, len(ptr) - 1),
                        train))
    np.testing.assert_allclose(mine, ref, **TOL)


def _group_pool_pair(refp, rng, groups, channels, use_mod, train,
                     gating=True, scaling=True, pool="max"):
    ptr, ids, V = make_csr(rng)
    x_mod = rng.normal(size=(V, channels)).astype(np.float32)
    x_map = rng.normal(size=(V, 8)).astype(np.float32)
    ref_mod = refp.GroupBimodalCSRPool(
        in_map=8, in_mod=channels, num_groups=groups, use_mod=use_mod,
        gating=gating, group_scaling=scaling, use_num=True, pool=pool)
    randomize_torch_module(ref_mod, seed=11)
    ref_mod.train(train)
    ref = ref_mod(None, torch.from_numpy(x_mod), torch.from_numpy(x_map),
                  torch.from_numpy(ptr)).detach().numpy()

    import jax

    mine_mod = GroupViewPool(channels, num_groups=groups, use_mod=use_mod,
                             gated=gating, scaling=scaling,
                             enc_pool=tuple(pool.split("_")))
    variables = unfreeze(mine_mod.init(
        jax.random.PRNGKey(0), jnp.asarray(x_mod), jnp.asarray(x_map),
        jnp.asarray(ids), None, len(ptr) - 1))
    sd = ref_mod.state_dict()
    p, s = variables["params"], variables["batch_stats"]
    copy_deepset(sd, "E_map", p["set_enc"], s["set_enc"])
    copy_torch_mlp(sd, "E_mod", p["e_mod"], s["e_mod"])
    if use_mod:
        copy_torch_mlp(sd, "E_mix", p["e_mix"], s["e_mix"])
    p["e_score"]["kernel"] = t2j(sd["E_score.weight"]).T
    p["e_score"]["bias"] = t2j(sd["E_score.bias"])
    if gating:
        p["gating"]["weight"] = t2j(sd["G.weight"]).reshape(-1)
        p["gating"]["bias"] = t2j(sd["G.bias"]).reshape(-1)

    args = (jnp.asarray(x_mod), jnp.asarray(x_map), jnp.asarray(ids), None,
            len(ptr) - 1)
    if train:
        (mine, _attn), _ = mine_mod.apply(variables, *args, train=True,
                                          mutable=["batch_stats"])
    else:
        mine, _attn = mine_mod.apply(variables, *args, train=False)
    return _np(mine), ref


@pytest.mark.parametrize("train", [False, True])
@pytest.mark.parametrize("groups,channels,use_mod", [
    (1, 12, False),
    (4, 12, False),
    (4, 10, False),   # uneven group sizes [3, 3, 2, 2]
    (8, 26, False),
    (4, 12, True),    # E_mix score path
])
def test_group_view_pool_parity(rng, refp, groups, channels, use_mod, train):
    mine, ref = _group_pool_pair(refp, rng, groups, channels, use_mod, train)
    np.testing.assert_allclose(mine, ref, **TOL)


def test_group_view_pool_nogating_parity(rng, refp):
    mine, ref = _group_pool_pair(refp, rng, 4, 12, False, False, gating=False)
    np.testing.assert_allclose(mine, ref, **TOL)


def test_group_view_pool_noscaling_parity(rng, refp):
    mine, ref = _group_pool_pair(refp, rng, 4, 12, False, False, scaling=False)
    np.testing.assert_allclose(mine, ref, **TOL)


def test_group_view_pool_minmax_setpool_parity(rng, refp):
    """The pool='min_max' published entry (sparseconv3d.yaml:4265): the
    DeepSetFeat set reduction concatenates min and max."""
    mine, ref = _group_pool_pair(refp, rng, 4, 12, False, False,
                                 pool="min_max")
    np.testing.assert_allclose(mine, ref, **TOL)


def _qkv_pool_pair(refp, rng, train, *, groups=4, channels=12,
                   use_mod_q=False, use_mod_k=False, group_scaling=False,
                   nc_qk=8, gating=True, dim_scaling=True):
    """Build the executed reference QKVBimodalCSRPool and this repo's
    QKVViewPool with transplanted weights; return (mine, ref) outputs."""
    n_main = 40
    ptr, ids, V = make_csr(rng, n_points=n_main)
    x_main = rng.normal(size=(n_main, 9)).astype(np.float32)
    x_mod = rng.normal(size=(V, channels)).astype(np.float32)
    x_map = rng.normal(size=(V, 8)).astype(np.float32)
    ref_mod = refp.QKVBimodalCSRPool(
        in_main=9, in_map=8, in_mod=channels, num_groups=groups,
        nc_qk=nc_qk, use_mod_q=use_mod_q, use_mod_k=use_mod_k,
        gating=gating, group_scaling=group_scaling, dim_scaling=dim_scaling,
        use_num=True)
    randomize_torch_module(ref_mod, seed=7)
    ref_mod.train(train)
    ref = ref_mod(torch.from_numpy(x_main), torch.from_numpy(x_mod),
                  torch.from_numpy(x_map),
                  torch.from_numpy(ptr)).detach().numpy()

    import jax

    mine_mod = QKVViewPool(channels, num_groups=groups, qk_channels=nc_qk,
                           gated=gating, scaling=group_scaling,
                           use_mod_q=use_mod_q, use_mod_k=use_mod_k,
                           dim_scaling=dim_scaling)
    variables = unfreeze(mine_mod.init(
        jax.random.PRNGKey(0), jnp.asarray(x_main), jnp.asarray(x_mod),
        jnp.asarray(x_map), jnp.asarray(ids), None, len(ptr) - 1))
    sd = ref_mod.state_dict()
    p, s = variables["params"], variables["batch_stats"]
    copy_torch_mlp(sd, "E_main", p["e_main"], s["e_main"])
    copy_deepset(sd, "E_map", p["key_enc"], s["key_enc"])
    copy_torch_mlp(sd, "E_mod", p["e_mod"], s["e_mod"])
    if use_mod_q:
        copy_torch_mlp(sd, "E_mix_Q", p["e_mix_q"], s["e_mix_q"])
    if use_mod_k:
        copy_torch_mlp(sd, "E_mix_K", p["e_mix_k"], s["e_mix_k"])
    p["q"]["kernel"] = t2j(sd["Q.weight"]).T
    p["q"]["bias"] = t2j(sd["Q.bias"])
    p["k"]["kernel"] = t2j(sd["K.weight"]).T
    p["k"]["bias"] = t2j(sd["K.bias"])
    if gating:
        p["gating"]["weight"] = t2j(sd["G.weight"]).reshape(-1)
        p["gating"]["bias"] = t2j(sd["G.bias"]).reshape(-1)

    args = (jnp.asarray(x_main), jnp.asarray(x_mod), jnp.asarray(x_map),
            jnp.asarray(ids), None, len(ptr) - 1)
    if train:
        (mine, _), _ = mine_mod.apply(variables, *args, train=True,
                                      mutable=["batch_stats"])
    else:
        mine, _ = mine_mod.apply(variables, *args, train=False)
    return _np(mine), ref


@pytest.mark.parametrize("train", [False, True])
def test_qkv_view_pool_parity(rng, refp, train):
    mine, ref = _qkv_pool_pair(refp, rng, train)
    np.testing.assert_allclose(mine, ref, **TOL)


@pytest.mark.parametrize("train", [False, True])
@pytest.mark.parametrize("use_mod_q,use_mod_k", [
    (True, False),    # per-view queries mixed with values (ref :493-500)
    (False, True),    # keys mixed with values (ref :486-490)
    (True, True),
])
def test_qkv_use_mod_parity(rng, refp, train, use_mod_q, use_mod_k):
    mine, ref = _qkv_pool_pair(refp, rng, train, use_mod_q=use_mod_q,
                               use_mod_k=use_mod_k)
    np.testing.assert_allclose(mine, ref, **TOL)


def test_qkv_published_variant_parity(rng, refp):
    """The XYZ-RGB-L4-late-QKV YAML shape: num_groups=4, group_scaling=True,
    gating=True, DeepSetFeat use_num (sparseconv3d.yaml:5230-5310)."""
    mine, ref = _qkv_pool_pair(refp, rng, False, groups=4,
                               group_scaling=True)
    np.testing.assert_allclose(mine, ref, **TOL)


def test_qkv_modk_published_variant_parity(rng, refp):
    """...-QKV-modk variant: use_mod_k=True + group_scaling=True."""
    mine, ref = _qkv_pool_pair(refp, rng, False, use_mod_k=True,
                               group_scaling=True)
    np.testing.assert_allclose(mine, ref, **TOL)


def test_qkv_nc_qk_parity(rng, refp):
    """Non-default nc_qk head width threads through Q/K shapes."""
    mine, ref = _qkv_pool_pair(refp, rng, False, nc_qk=4, groups=2)
    np.testing.assert_allclose(mine, ref, **TOL)


def test_qkv_group_not_dim_scaling_parity(rng, refp):
    """The XYZ+RGB_a4-group_cat-1 shape: group_scaling on, dim_scaling OFF
    (sparseconv3d.yaml Attentive entries set dim_scaling explicitly)."""
    mine, ref = _qkv_pool_pair(refp, rng, False, group_scaling=True,
                               dim_scaling=False)
    np.testing.assert_allclose(mine, ref, **TOL)


# -------------------------------------------------------------- fusion -----
@pytest.mark.parametrize("mode", ["residual", "concatenation", "both",
                                  "modality"])
def test_bimodal_fusion_parity(rng, reff, mode):
    a = rng.normal(size=(17, 12)).astype(np.float32)
    b = rng.normal(size=(17, 12)).astype(np.float32)
    ref = reff.BimodalFusion(mode=mode)(
        torch.from_numpy(a), torch.from_numpy(b)).numpy()
    import jax

    mod = BimodalFusion(mode)
    vars_ = mod.init(jax.random.PRNGKey(0), jnp.asarray(a), jnp.asarray(b))
    mine = _np(mod.apply(vars_, jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(mine, ref, **TOL)


# ------------------------------------------------- bilinear gather ---------
@pytest.mark.parametrize("scale", [2, 4])
def test_sparse_interpolation_parity(rng, scale):
    """gather_pixel_features(interpolate=True) vs the reference's
    sparse_interpolation + get_mapped_features coord convention
    (core/multimodal/image.py:105-170,1279-1283).  Scale 1 is NOT a
    sparse_interpolation case: the reference's ``interpolate and scale != 1``
    guard (image.py:1278) indexes exactly there — covered by
    test_gather_scale1_exact below."""
    from reference_shims import load_reference_function

    sparse_interpolation = load_reference_function(
        "torch_points3d/core/multimodal/image.py", "sparse_interpolation")

    from deepviewagg_tpu.modules.gather import gather_pixel_features

    W, H = 32, 24                    # mapping (reference) resolution
    wf, hf = W // scale, H // scale  # feature-map resolution
    n_img, C, P = 3, 5, 64
    maps_torch = torch.from_numpy(
        rng.normal(size=(n_img, C, hf, wf)).astype(np.float32))
    px = rng.integers(0, W, P)
    py = rng.integers(0, H, P)
    img = rng.integers(0, n_img, P)

    # reference: coords = pixels/(res-1) in (y, x) order on (B, C, H, W)
    coords = torch.from_numpy(
        np.stack([py / (H - 1), px / (W - 1)], 1).astype(np.float32))
    ref = sparse_interpolation(maps_torch, coords,
                               torch.from_numpy(img)).numpy()

    # mine: maps [I, W, H, C]; one view per pixel row, identity image ids
    maps = jnp.asarray(maps_torch.permute(0, 3, 2, 1).numpy())
    mapping = {
        "view_valid": jnp.ones(P, bool),
        "image_id": jnp.asarray(img.astype(np.int32)),
        "pix_view": jnp.arange(P, dtype=jnp.int32),
        "pix_x": jnp.asarray(px.astype(np.int32)),
        "pix_y": jnp.asarray(py.astype(np.int32)),
        "pix_valid": jnp.ones(P, bool),
    }
    mine = _np(gather_pixel_features(maps, mapping, (W, H), interpolate=True))
    np.testing.assert_allclose(mine, ref, **TOL)


def test_gather_scale1_exact(rng):
    """At scale 1 the reference bypasses interpolation entirely
    (``if interpolate and scale != 1``, image.py:1278): gathered features
    must equal exact pixel lookup bit-for-bit."""
    from deepviewagg_tpu.modules.gather import gather_pixel_features

    W, H, n_img, C, P = 32, 24, 3, 5, 64
    maps = jnp.asarray(rng.normal(size=(n_img, W, H, C)).astype(np.float32))
    px = rng.integers(0, W, P)
    py = rng.integers(0, H, P)
    img = rng.integers(0, n_img, P)
    mapping = {
        "view_valid": jnp.ones(P, bool),
        "image_id": jnp.asarray(img.astype(np.int32)),
        "pix_view": jnp.arange(P, dtype=jnp.int32),
        "pix_x": jnp.asarray(px.astype(np.int32)),
        "pix_y": jnp.asarray(py.astype(np.int32)),
        "pix_valid": jnp.ones(P, bool),
    }
    mine = _np(gather_pixel_features(maps, mapping, (W, H), interpolate=True))
    np.testing.assert_array_equal(mine, _np(maps)[img, px, py])
