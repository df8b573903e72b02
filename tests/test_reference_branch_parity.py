"""COMPOSED branch parity: the reference's actual ``UnimodalBranch.forward``
(modules/multimodal/modules.py:249-567) executed end-to-end — feature-map
gather -> atomic pool -> view-cat sort -> group-attention view pool -> fusion
-> ``x_seen`` — against this repo's flax :class:`UnimodalBranch` with
transplanted weights on identical mappings (VERDICT r3 missing #1).

Module-level math was already proven equal (test_reference_parity.py); this
file pins the *composition*: the multi-setting concat+sort
(``view_cat_sorting``, image.py:1550-1589), the bilinear/nearest gather at
branch level, empty-view points, ``x_seen`` (modules.py:410), residual vs
concatenation fusion placement, and the ``keep_last_view`` view-level
tensors (modules.py:527-534).
"""

from __future__ import annotations

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
from flax.core import unfreeze

from reference_shims import (
    copy_deepset,
    copy_torch_mlp,
    load_reference_fusion,
    load_reference_image,
    load_reference_mm_modules,
    load_reference_pooling,
    randomize_torch_module,
    t2j,
)

from deepviewagg_tpu.modules.branch import UnimodalBranch

TOL = dict(rtol=1e-5, atol=1e-5)
N_PTS = 48
C2 = 12        # modality channels = x_3d channels (residual fusion)
C3 = 12
NUM_FEATS = 8  # mapping features


@pytest.fixture(scope="module")
def refm():
    return load_reference_mm_modules()


@pytest.fixture(scope="module")
def refp():
    return load_reference_pooling()


@pytest.fixture(scope="module")
def reff():
    return load_reference_fusion()


@pytest.fixture(scope="module")
def ri():
    return load_reference_image()


# ------------------------------------------------------------ fixtures -----
def _dense_rows(rng, n_img, W, H, n_rows, p_lo=0, p_hi=N_PTS):
    """Unique (point, image, x, y) rows + constant-per-view 8-dim features
    (from_dense averages per-view, so constants survive the round trip)."""
    pid = rng.integers(p_lo, p_hi, n_rows)
    iid = rng.integers(0, n_img, n_rows)
    px = rng.integers(0, W, n_rows)
    py = rng.integers(0, H, n_rows)
    key = ((pid * n_img + iid) * W + px) * H + py
    _, first = np.unique(key, return_index=True)
    pid, iid, px, py = pid[first], iid[first], px[first], py[first]
    vfeat = rng.normal(size=(N_PTS * n_img, NUM_FEATS)).astype(np.float32)
    return pid, iid, px, py, vfeat[pid * n_img + iid]


def _make_sid(ri, rng, rows, n_img, W, H, scale):
    """Reference SameSettingImageData: mappings at ref (W, H), feature maps
    ``x`` at (W/scale, H/scale) — the x setter adjusts ``downscale``."""
    pid, iid, px, py, feats = rows
    mapping = ri.ImageMapping.from_dense(
        torch.from_numpy(pid.astype(np.int64)),
        torch.from_numpy(iid.astype(np.int64)),
        torch.from_numpy(np.stack([px, py], 1).astype(np.int64)),
        torch.from_numpy(feats),
        num_points=N_PTS)
    x = torch.from_numpy(
        rng.normal(size=(n_img, C2, H // scale, W // scale))
        .astype(np.float32))
    sid = ri.SameSettingImageData(
        path=np.array([f"im{i}" for i in range(n_img)], dtype="O"),
        pos=torch.zeros(n_img, 3), opk=torch.zeros(n_img, 3),
        ref_size=(W, H), proj_upscale=1, x=x, mappings=mapping)
    return sid


def _flat_mapping(settings, img_offsets):
    """This repo's flat mapping pytree from the same dense rows: the union
    over settings, image ids offset per setting (the collate convention)."""
    vp, vi, vf, pv, px_, py_ = [], [], [], [], [], []
    v_base = 0
    for (pid, iid, px, py, feats), off in zip(settings, img_offsets):
        order = np.lexsort((py, px, iid, pid))
        pid, iid, px, py, feats = (a[order] for a in (pid, iid, px, py, feats))
        n_img_total = iid.max() + 1
        vkey = pid * n_img_total + iid
        uniq, vfirst, vinv = np.unique(vkey, return_index=True,
                                       return_inverse=True)
        vp.append((uniq // n_img_total).astype(np.int32))
        vi.append((uniq % n_img_total).astype(np.int32) + off)
        vf.append(feats[vfirst])
        pv.append(vinv.astype(np.int32) + v_base)
        px_.append(px.astype(np.int32))
        py_.append(py.astype(np.int32))
        v_base += len(uniq)
    return {
        "point_id": jnp.asarray(np.concatenate(vp)),
        "image_id": jnp.asarray(np.concatenate(vi)),
        "view_feats": jnp.asarray(np.concatenate(vf)),
        "view_valid": jnp.ones(v_base, bool),
        "pix_view": jnp.asarray(np.concatenate(pv)),
        "pix_x": jnp.asarray(np.concatenate(px_)),
        "pix_y": jnp.asarray(np.concatenate(py_)),
        "pix_valid": jnp.ones(sum(len(p) for p in px_), bool),
    }


def _ref_branch(refm, refp, reff, fusion_mode, atomic, groups,
                keep_last_view=False, seed=5):
    branch = refm.UnimodalBranch(
        None,
        refp.BimodalCSRPool(mode=atomic),
        refp.GroupBimodalCSRPool(
            in_map=NUM_FEATS, in_mod=C2, num_groups=groups, use_mod=False,
            gating=True, group_scaling=True, use_num=True),
        reff.BimodalFusion(mode=fusion_mode),
        keep_last_view=keep_last_view)
    randomize_torch_module(branch, seed=seed)
    return branch


def _my_branch(fusion_mode, atomic, groups, interpolate,
               keep_last_view=False):
    return UnimodalBranch(
        tower=None, out_channels=C2, atomic_reduce=atomic,
        view_pool="group", num_groups=groups, gated=True,
        interpolate=interpolate, fusion_mode=fusion_mode,
        keep_last_view=keep_last_view, tower_bf16=False)


def _transplant(branch_torch, variables):
    """Reference branch state_dict -> flax branch variables (pool weights;
    residual/concat fusion and the CSR pools are parameter-free)."""
    sd = branch_torch.state_dict()
    p = variables["params"]["view_pool"]
    s = variables["batch_stats"]["view_pool"]
    copy_deepset(sd, "view_pool.E_map", p["set_enc"], s["set_enc"])
    copy_torch_mlp(sd, "view_pool.E_mod", p["e_mod"], s["e_mod"])
    p["e_score"]["kernel"] = t2j(sd["view_pool.E_score.weight"]).T
    p["e_score"]["bias"] = t2j(sd["view_pool.E_score.bias"])
    p["gating"]["weight"] = t2j(sd["view_pool.G.weight"]).reshape(-1)
    p["gating"]["bias"] = t2j(sd["view_pool.G.bias"]).reshape(-1)
    return variables


def _run_pair(refm, refp, reff, ri, rng, settings_shapes, scale=1,
              interpolate=True, fusion_mode="residual", atomic="max",
              groups=4, train=False, keep_last_view=False):
    """Build both stacks on the same dense relation; return (ref, mine)."""
    rows_list, sids, img_arrays, offsets = [], [], [], []
    off = 0
    for n_img, W, H, n_rows in settings_shapes:
        rows = _dense_rows(rng, n_img, W, H, n_rows)
        rows_list.append(rows)
        sid = _make_sid(ri, rng, rows, n_img, W, H, scale)
        sids.append(sid)
        img_arrays.append(sid.x.permute(0, 3, 2, 1).numpy())  # NCHW->IWHC
        offsets.append(off)
        off += n_img

    x3d = rng.normal(size=(N_PTS, C3)).astype(np.float32)

    # ---- reference composed forward ------------------------------------
    ref_branch = _ref_branch(refm, refp, reff, fusion_mode, atomic, groups,
                             keep_last_view=keep_last_view)
    ref_branch.interpolate = interpolate
    ref_branch.train(train)
    img_data = ri.ImageData([s.clone() for s in sids])
    mm_dict = {"x_3d": torch.from_numpy(x3d.copy()), "x_seen": None,
               "modalities": {"image": img_data}}
    out = ref_branch(mm_dict, "image")
    ref_x3d = out["x_3d"].detach().numpy()
    ref_seen = out["x_seen"].numpy()

    # ---- this repo's composed forward ----------------------------------
    # all settings share the mapping ref resolution in these tests, so one
    # flat image tensor + union mapping reproduce the multi-setting batch
    W, H = settings_shapes[0][1], settings_shapes[0][2]
    images = jnp.asarray(np.concatenate(img_arrays, 0))
    mapping = _flat_mapping(rows_list, offsets)
    mine_mod = _my_branch(fusion_mode, atomic, groups, interpolate,
                          keep_last_view=keep_last_view)
    variables = unfreeze(mine_mod.init(
        jax.random.PRNGKey(0), jnp.asarray(x3d), images, mapping, (W, H),
        train=False))
    variables = _transplant(ref_branch, variables)
    if train:
        (mine_x3d, mine_seen, extras), _ = mine_mod.apply(
            variables, jnp.asarray(x3d), images, mapping, (W, H),
            train=True, mutable=["batch_stats"])
    else:
        mine_x3d, mine_seen, extras = mine_mod.apply(
            variables, jnp.asarray(x3d), images, mapping, (W, H),
            train=False)
    return (ref_x3d, ref_seen, mm_dict), \
           (np.asarray(mine_x3d), np.asarray(mine_seen), extras, mapping)


# --------------------------------------------------------------- tests -----
@pytest.mark.parametrize("train", [False, True])
def test_branch_single_setting(refm, refp, reff, ri, train):
    """One camera setting, feature maps at mapping scale, nearest gather."""
    rng = np.random.default_rng(0)
    (ref_x3d, ref_seen, _), (my_x3d, my_seen, _, _) = _run_pair(
        refm, refp, reff, ri, rng, [(3, 16, 12, 300)], scale=1,
        interpolate=False, train=train)
    np.testing.assert_array_equal(my_seen, ref_seen)
    np.testing.assert_allclose(my_x3d, ref_x3d, **TOL)


def test_branch_bilinear_downscaled(refm, refp, reff, ri):
    """Feature maps at half the mapping resolution consumed through the
    bilinear sparse_interpolation path (the '-interpolate' flagships)."""
    rng = np.random.default_rng(1)
    (ref_x3d, ref_seen, _), (my_x3d, my_seen, _, _) = _run_pair(
        refm, refp, reff, ri, rng, [(3, 16, 12, 300)], scale=2,
        interpolate=True)
    np.testing.assert_array_equal(my_seen, ref_seen)
    np.testing.assert_allclose(my_x3d, ref_x3d, **TOL)


@pytest.mark.parametrize("train", [False, True])
def test_branch_multi_setting_viewcat(refm, refp, reff, ri, train):
    """TWO settings: the reference concatenates + sorts view features
    across settings (view_cat_sorting); the flat union mapping must pool
    identically."""
    rng = np.random.default_rng(2)
    (ref_x3d, ref_seen, _), (my_x3d, my_seen, _, _) = _run_pair(
        refm, refp, reff, ri, rng,
        [(2, 16, 12, 220), (3, 16, 12, 260)], scale=1,
        interpolate=False, train=train)
    np.testing.assert_array_equal(my_seen, ref_seen)
    np.testing.assert_allclose(my_x3d, ref_x3d, **TOL)


def test_branch_concat_fusion(refm, refp, reff, ri):
    """Concatenation fusion doubles the width: [x_3d | pooled]."""
    rng = np.random.default_rng(3)
    (ref_x3d, ref_seen, _), (my_x3d, my_seen, _, _) = _run_pair(
        refm, refp, reff, ri, rng, [(3, 16, 12, 300)], scale=1,
        interpolate=False, fusion_mode="concatenation")
    assert ref_x3d.shape[1] == C3 + C2
    np.testing.assert_array_equal(my_seen, ref_seen)
    np.testing.assert_allclose(my_x3d, ref_x3d, **TOL)


@pytest.mark.parametrize("atomic", ["mean", "sum"])
def test_branch_atomic_modes(refm, refp, reff, ri, atomic):
    rng = np.random.default_rng(4)
    (ref_x3d, ref_seen, _), (my_x3d, my_seen, _, _) = _run_pair(
        refm, refp, reff, ri, rng, [(3, 16, 12, 300)], scale=1,
        interpolate=False, atomic=atomic)
    np.testing.assert_array_equal(my_seen, ref_seen)
    np.testing.assert_allclose(my_x3d, ref_x3d, **TOL)


def test_branch_unseen_points(refm, refp, reff, ri):
    """Points 30.. have no views at all: x_seen False there, residual
    fusion must leave their x_3d untouched on both sides."""
    rng = np.random.default_rng(5)
    rows = _dense_rows(rng, 3, 16, 12, 300, p_hi=30)
    sid = _make_sid(ri, rng, rows, 3, 16, 12, 1)
    x3d = rng.normal(size=(N_PTS, C3)).astype(np.float32)

    ref_branch = _ref_branch(refm, refp, reff, "residual", "max", 4)
    ref_branch.interpolate = False
    ref_branch.eval()
    mm_dict = {"x_3d": torch.from_numpy(x3d.copy()), "x_seen": None,
               "modalities": {"image": ri.ImageData([sid])}}
    out = ref_branch(mm_dict, "image")
    ref_seen = out["x_seen"].numpy()
    assert not ref_seen[30:].any() and ref_seen[:30].any()

    images = jnp.asarray(sid.x.permute(0, 3, 2, 1).numpy())
    mapping = _flat_mapping([rows], [0])
    mine_mod = _my_branch("residual", "max", 4, False)
    variables = unfreeze(mine_mod.init(
        jax.random.PRNGKey(0), jnp.asarray(x3d), images, mapping, (16, 12),
        train=False))
    variables = _transplant(ref_branch, variables)
    my_x3d, my_seen, _ = mine_mod.apply(
        variables, jnp.asarray(x3d), images, mapping, (16, 12), train=False)
    np.testing.assert_array_equal(np.asarray(my_seen), ref_seen)
    np.testing.assert_allclose(np.asarray(my_x3d),
                               out["x_3d"].detach().numpy(), **TOL)
    # unseen rows: attention over an empty segment melts to zeros -> the
    # residual keeps x_3d (gating maps zero-score to tanh+ output on both
    # sides identically)
    np.testing.assert_allclose(np.asarray(my_x3d)[30:],
                               out["x_3d"].detach().numpy()[30:], **TOL)


def test_branch_keep_last_view(refm, refp, reff, ri):
    """keep_last_view stores the pre-view-pool view features + CSR pointers
    (modules.py:527-534) for view losses; per-point multisets must match."""
    rng = np.random.default_rng(6)
    (ref_x3d, ref_seen, mm_dict), (my_x3d, my_seen, extras, mapping) = \
        _run_pair(refm, refp, reff, ri, rng,
                  [(2, 16, 12, 220), (3, 16, 12, 260)], scale=1,
                  interpolate=False, keep_last_view=True)
    np.testing.assert_allclose(my_x3d, ref_x3d, **TOL)

    mod = mm_dict["modalities"]["image"]
    ref_xv = mod.last_view_x_mod.detach().numpy()
    ref_csr = mod.last_view_csr_idx.numpy()
    sizes = ref_csr[1:] - ref_csr[:-1]
    ref_pid = np.repeat(np.arange(N_PTS), sizes)

    my_xv = np.asarray(extras["x_view"])
    my_pid = np.asarray(mapping["point_id"])
    assert my_xv.shape == ref_xv.shape
    for p in range(N_PTS):
        a = np.sort(ref_xv[ref_pid == p], axis=0)
        b = np.sort(my_xv[my_pid == p], axis=0)
        np.testing.assert_allclose(b, a, **TOL,
                                   err_msg=f"view rows differ at point {p}")
