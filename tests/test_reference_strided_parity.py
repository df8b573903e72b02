"""COMPOSED strided multimodal-UNet parity (VERDICT r4 missing #1).

The reference's own ``MultimodalBlockDown`` executes verbatim across TWO
stride changes with LIVE mappings and real ``UnimodalBranch`` modules at both
levels: ``forward_3d_block_down`` recovers the voxel reindex from the sparse
coords via its torchsparse sphash/sphashquery path (modules.py:166-212),
scatter-merges ``x_seen`` (modules.py:221-226) and runs
``ImageMapping.select_points(idx, mode='merge')`` on the image data
(modules.py:232-235) — *interleaved* with branch forwards at successive
levels, the composition SURVEY §7 calls the trickiest correctness
interaction.

This repo's equivalent is host-side: ``ops.voxel.downsample_coords`` parents
+ ``MultiViewMapping.merge_points`` at collate time (data/collate.py:150-156)
with the jitted branch at each level.  The test pins both stacks to the same
scene: the 3D "conv" is ``MockStridedVoxelConv`` (reference_shims) on the
torch side and an independently written numpy linear+mean-pool here, with
identical transplanted weights, so any divergence isolates the
stride-merge interleaving itself.
"""

from __future__ import annotations

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
from flax.core import unfreeze

from reference_shims import (
    FakeSparseTensor,
    MockStridedVoxelConv,
    load_reference_fusion,
    load_reference_image,
    load_reference_mm_modules,
    load_reference_pooling,
    randomize_torch_module,
)
from test_reference_branch_parity import (
    C2,
    N_PTS,
    _dense_rows,
    _make_sid,
    _my_branch,
    _ref_branch,
    _transplant,
)

from deepviewagg_tpu.data.mapping import MultiViewMapping
from deepviewagg_tpu.ops.voxel import downsample_coords

TOL = dict(rtol=1e-5, atol=1e-5)
N_BATCH = 2
GRID = 8          # points on an 8^3 grid per batch -> real merging at s=2,4
N_IMG = 3
W, H = 16, 12


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


def _scene(rng):
    """Unique level-0 voxel coords (batch-first [N,4]) + mapping rows."""
    per = N_PTS // N_BATCH
    coords = []
    for b in range(N_BATCH):
        flat = rng.choice(GRID ** 3, per, replace=False)
        xyz = np.stack(np.unravel_index(flat, (GRID,) * 3), 1)
        coords.append(np.concatenate(
            [np.full((per, 1), b), xyz], 1).astype(np.int32))
    coords_bf = np.concatenate(coords)
    rows = _dense_rows(rng, N_IMG, W, H, 340)
    return coords_bf, rows


def _repo_mapping(rows):
    """MultiViewMapping from the dense rows (the mapping-parity test's
    construction: rows lexsorted so pix_view comes out ascending)."""
    pid, iid, px, py, feats = rows
    order = np.lexsort((py, px, iid, pid))
    pid, iid, px, py, feats = (a[order] for a in (pid, iid, px, py, feats))
    vkey = pid * N_IMG + iid
    uniq, vfirst, vinv = np.unique(vkey, return_index=True,
                                   return_inverse=True)
    m = MultiViewMapping(
        point_id=(uniq // N_IMG).astype(np.int32),
        image_id=(uniq % N_IMG).astype(np.int32),
        view_feats=feats[vfirst],
        view_valid=np.ones(len(uniq), bool),
        pix_view=vinv.astype(np.int32),
        pix_x=px.astype(np.int32),
        pix_y=py.astype(np.int32),
        pix_valid=np.ones(len(pid), bool),
        num_points=N_PTS,
        num_images=N_IMG,
    )
    m.check()
    return m


def _np_conv(x, lin, parent, n_out):
    """The mock conv's math, written independently in numpy: linear -> ReLU
    -> unweighted mean over each output voxel's children."""
    w = lin.weight.detach().numpy()
    b = lin.bias.detach().numpy()
    f = np.maximum(x.astype(np.float64) @ w.T.astype(np.float64) + b, 0.0)
    acc = np.zeros((n_out, f.shape[1]), np.float64)
    np.add.at(acc, parent, f)
    cnt = np.zeros(n_out, np.float64)
    np.add.at(cnt, parent, 1.0)
    return (acc / np.maximum(cnt, 1.0)[:, None]).astype(np.float32)


def _apply_branch(branch_mod, ref_branch, x_np, images, mdev, train):
    variables = unfreeze(branch_mod.init(
        jax.random.PRNGKey(0), jnp.asarray(x_np), images, mdev, (W, H),
        train=False))
    variables = _transplant(ref_branch, variables)
    if train:
        (x, seen, _), _ = branch_mod.apply(
            variables, jnp.asarray(x_np), images, mdev, (W, H),
            train=True, mutable=["batch_stats"])
    else:
        x, seen, _ = branch_mod.apply(
            variables, jnp.asarray(x_np), images, mdev, (W, H), train=False)
    return np.asarray(x), np.asarray(seen)


@pytest.mark.parametrize("train", [False, True])
def test_strided_multimodal_block_parity(refm, refp, reff, ri, train):
    """Two MultimodalBlockDown blocks, each with a REAL stride-2 voxel
    downsample THEN a live image branch — the reference's sphashquery
    reindex + select_points('merge') + x_seen scatter chain vs this repo's
    downsample_coords parents + merge_points collate path."""
    rng = np.random.default_rng(7)
    coords_bf, rows = _scene(rng)
    sid = _make_sid(ri, rng, rows, N_IMG, W, H, scale=1)
    x3d = rng.normal(size=(N_PTS, C2)).astype(np.float32)

    conv1 = MockStridedVoxelConv(C2, C2)
    conv2 = MockStridedVoxelConv(C2, C2)
    randomize_torch_module(conv1, seed=11)
    randomize_torch_module(conv2, seed=12)
    ref_b1 = _ref_branch(refm, refp, reff, "residual", "max", 4, seed=5)
    ref_b2 = _ref_branch(refm, refp, reff, "residual", "max", 4, seed=6)
    ref_b1.interpolate = ref_b2.interpolate = False

    # ---- reference: the blocks execute verbatim on a mock SparseTensor ---
    block1 = refm.MultimodalBlockDown(conv1, None, image=ref_b1)
    block2 = refm.MultimodalBlockDown(conv2, None, image=ref_b2)
    block1.train(train)
    block2.train(train)
    coords_bl = torch.from_numpy(coords_bf[:, [1, 2, 3, 0]].copy()).int()
    st = FakeSparseTensor(torch.from_numpy(x3d.copy()), coords_bl, s=1)
    mm = {"x_3d": st, "x_seen": None,
          "modalities": {"image": ri.ImageData([sid.clone()])}}
    with torch.no_grad():
        mm = block1(mm)
        ref_mid = mm["x_3d"].F.numpy().copy()
        ref_seen_mid = mm["x_seen"].numpy().copy()
        mm = block2(mm)
    ref_out = mm["x_3d"].F.numpy()
    ref_seen = mm["x_seen"].numpy()
    ref_coords_l2 = mm["x_3d"].C.numpy()
    ref_map_l2 = mm["modalities"]["image"][0].mappings

    # ---- this repo: host-side parents + merge_points + jitted branches ---
    out1, parent1 = downsample_coords(coords_bf, 2)
    out2, parent2 = downsample_coords(out1, 4)
    n1, n2 = len(out1), len(out2)
    # the two implementations must agree on the voxel sets AND their
    # canonical order — rows align 1:1 below because of this
    np.testing.assert_array_equal(
        out1[:, [1, 2, 3, 0]],
        block1.block_1(FakeSparseTensor(torch.zeros(len(coords_bl), C2),
                                        coords_bl, s=1)).C.numpy())
    np.testing.assert_array_equal(out2[:, [1, 2, 3, 0]], ref_coords_l2)

    m0 = _repo_mapping(rows)
    m1 = m0.merge_points(parent1, n1)
    m1.check()
    m2 = m1.merge_points(parent2, n2)
    m2.check()
    # merged mapping row counts match the reference's select_points output
    assert m2.num_views == ref_map_l2.images.shape[0]
    assert m2.num_pixels == ref_map_l2.pixels.shape[0]

    images = jnp.asarray(sid.x.permute(0, 3, 2, 1).numpy())  # NCHW -> IWHC
    vc, qc = m0.view_capacity, m0.pixel_capacity
    my_b = _my_branch("residual", "max", 4, interpolate=False)

    x1 = _np_conv(x3d, conv1.lin, parent1, n1)
    x1f, seen1 = _apply_branch(my_b, ref_b1, x1,
                               images, m1.pad(vc, qc).to_device(), train)
    np.testing.assert_array_equal(seen1, ref_seen_mid)
    np.testing.assert_allclose(x1f, ref_mid, **TOL)

    x2 = _np_conv(x1f, conv2.lin, parent2, n2)
    seen_carried = np.zeros(n2, bool)
    np.logical_or.at(seen_carried, parent2, seen1)
    x2f, seen2 = _apply_branch(my_b, ref_b2, x2,
                               images, m2.pad(vc, qc).to_device(), train)

    np.testing.assert_array_equal(seen2 | seen_carried, ref_seen)
    np.testing.assert_allclose(x2f, ref_out, **TOL)
