"""MODEL-level composed parity: the reference's full No3D forward — its own
scratch UNet tower INSIDE its own ``UnimodalBranch`` INSIDE its own
``MultimodalBlockDown`` (the executed ``No3DEncoder.forward`` chain,
applications/multimodal/no3d.py:100-104), then the ``No3DFeatureFusion``
linear head + log_softmax (models/segmentation/multimodal/no3d.py:36-38,
102-103) — against this repo's :class:`No3DSeg` with every weight
transplanted, per-point log-probs ≤1e-5 (VERDICT r3 missing #1, the last
composed-parity gap).

Branch-level composition (test_reference_branch_parity) ran with
``conv=None``; this file is the first place the reference's tower runs
*inside* the branch (forward_conv, modules.py:442-479), so the
tower→gather→atomic→view→fusion→head chain is pinned end-to-end, plus the
eval-time nearest-seen propagation semantics (no3d.py:105-126).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp
from flax.core import unfreeze

from reference_shims import (
    copy_deepset,
    copy_scratch_unet,
    copy_torch_mlp,
    load_reference_fusion,
    load_reference_image,
    load_reference_image_modality,
    load_reference_mm_modules,
    load_reference_pooling,
    randomize_torch_module,
    t2j,
)
from test_reference_branch_parity import _dense_rows, _flat_mapping, _make_sid

from deepviewagg_tpu.models.segmentation import (
    BranchSpec,
    ModelSpec,
    build_model,
)

TOL = dict(rtol=1e-5, atol=1e-5)
N_PTS = 48
C2 = 12          # tower output channels (last UnaryConv)
NUM_FEATS = 8
N_CLS = 5
GROUPS = 4
W, H = 16, 12    # two stride-2 stages -> must be /4
IN_FEAT = 8
DOWN_N = [0, 2, 2]
UP_N = [1, 1]


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


@pytest.fixture(scope="module")
def ri2():
    return load_reference_image_modality()


def _ref_tower_from_table(ri2, down, up, last_nc, seed=21):
    """A scratch tower from the reference's OWN classes, compact-format
    assembly per image.py:546-572.  ``down`` rows are
    (nc_in, nc_out, k, s, p, N); ``up`` rows (nc_in, nc_skip, nc_out, k, s,
    p, N); ``last_nc`` = (in, out) of the UnaryConv or None."""
    downs = torch.nn.ModuleList([
        ri2.ResNetDown(down_conv_nn=[a, b], kernel_size=k, stride=s,
                       padding=p, N=n, normalization="GroupNorm",
                       weight_standardization=True)
        for a, b, k, s, p, n in down
    ])
    ups = torch.nn.ModuleList([
        ri2.ResNetUp(up_conv_nn=[a, sk, b], kernel_size=k, stride=s,
                     padding=p, N=n, normalization="GroupNorm",
                     weight_standardization=True)
        for a, sk, b, k, s, p, n in up
    ])
    last = ri2.UnaryConv(*last_nc) if last_nc else None

    class Tower(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.down_modules = downs
            self.up_modules = ups
            self.last = last

        def forward(self, x, *args):
            stack = []
            for i in range(len(self.down_modules) - 1):
                x = self.down_modules[i](x)
                stack.append(x)
            x = self.down_modules[-1](x)
            for up in self.up_modules:
                skip = stack.pop(-1) if stack else None
                x = up(x, skip)
            return self.last(x) if self.last is not None else x

    tower = Tower()
    randomize_torch_module(tower, seed=seed)
    return tower


def _build_ref_tower(ri2, seed=21):
    """The small 3-down/2-up/UnaryConv tower the composed tests use."""
    down = ((3, IN_FEAT, 3, 1, 1, DOWN_N[0]),
            (IN_FEAT, IN_FEAT, 2, 2, 0, DOWN_N[1]),
            (IN_FEAT, 2 * IN_FEAT, 2, 2, 0, DOWN_N[2]))
    up = ((2 * IN_FEAT, IN_FEAT, IN_FEAT, 2, 2, 0, UP_N[0]),
          (IN_FEAT, IN_FEAT, IN_FEAT, 2, 2, 0, UP_N[1]))
    return _ref_tower_from_table(ri2, down, up, (IN_FEAT, C2), seed=seed)


def _repo_tower_cfg():
    down = ((3, IN_FEAT, 3, 1, 1, DOWN_N[0]),
            (IN_FEAT, IN_FEAT, 2, 2, 0, DOWN_N[1]),
            (IN_FEAT, 2 * IN_FEAT, 2, 2, 0, DOWN_N[2]))
    up = ((2 * IN_FEAT, IN_FEAT, IN_FEAT, 2, 2, 0, UP_N[0]),
          (IN_FEAT, IN_FEAT, IN_FEAT, 2, 2, 0, UP_N[1]))
    return (down, up, C2)


def _run_pair(refm, refp, reff, ri, ri2, rng, train, p_hi=N_PTS):
    """Both full model stacks on the same dense relation; returns
    (ref log-probs, ref seen, my log-probs, my seen, pos).  ``p_hi`` caps
    the mapped point range so points >= p_hi stay unseen."""
    n_img, n_rows = 3, 300
    rows = _dense_rows(rng, n_img, W, H, n_rows, p_hi=p_hi)
    sid = _make_sid(ri, rng, rows, n_img, W, H, scale=1)
    # raw RGB input: the tower consumes NCHW images, not feature maps
    images_t = torch.from_numpy(
        rng.normal(size=(n_img, 3, H, W)).astype(np.float32))
    sid.x = images_t.clone()

    # --- reference: MultimodalBlockDown(Identity, Identity, image=branch)
    # exactly as No3DEncoder.forward runs it, then head + log_softmax ------
    tower = _build_ref_tower(ri2)
    branch = refm.UnimodalBranch(
        tower,
        refp.BimodalCSRPool(mode="max"),
        refp.GroupBimodalCSRPool(
            in_map=NUM_FEATS, in_mod=C2, num_groups=GROUPS, use_mod=False,
            gating=True, group_scaling=True, use_num=True),
        reff.BimodalFusion(mode="modality"),
        interpolate=True)
    randomize_torch_module(branch.view_pool, seed=23)
    block = refm.MultimodalBlockDown(None, None, image=branch)
    block.train(train)
    head = torch.nn.Linear(C2, N_CLS)
    randomize_torch_module(head, seed=25)

    x3d = rng.normal(size=(N_PTS, 3)).astype(np.float32)
    img_data = ri.ImageData([sid.clone()])
    mm = {"x_3d": torch.from_numpy(x3d.copy()), "x_seen": None,
          "modalities": {"image": img_data}}
    with torch.no_grad():
        mm = block(mm)
        ref_logp = F.log_softmax(head(mm["x_3d"]), dim=-1).numpy()
    ref_seen = mm["x_seen"].numpy()

    # --- this repo: No3DSeg from a spec with the scratch tower ----------
    spec = ModelSpec(
        num_classes=N_CLS, in_channels=3, family="no3d",
        branches=((0, BranchSpec(
            tower="scratch_unet", tower_cfg=_repo_tower_cfg(),
            out_channels=C2, view_pool="group", num_groups=GROUPS,
            gated=True, pool_scaling=True, pool_use_num=True,
            interpolate=True, tower_bf16=False)),))
    model = build_model(spec)
    images = jnp.asarray(images_t.numpy().transpose(0, 3, 2, 1))  # IWHC
    mapping = _flat_mapping([rows], [0])
    batch = {"feats": jnp.asarray(x3d), "images": images,
             "mappings": {0: mapping}}
    variables = unfreeze(model.init(jax.random.PRNGKey(0), batch,
                                    train=False))

    p = variables["params"]["branch"]
    # wh=True: in-branch towers consume the repo's [I, W, H, C] images, so
    # torch kernels transplant with spatial axes swapped (WHIO)
    copy_scratch_unet(tower.state_dict(), p["tower"], DOWN_N, UP_N, wh=True)
    sd = branch.state_dict()
    vp, vs = p["view_pool"], variables["batch_stats"]["branch"]["view_pool"]
    copy_deepset(sd, "view_pool.E_map", vp["set_enc"], vs["set_enc"])
    copy_torch_mlp(sd, "view_pool.E_mod", vp["e_mod"], vs["e_mod"])
    vp["e_score"]["kernel"] = t2j(sd["view_pool.E_score.weight"]).T
    vp["e_score"]["bias"] = t2j(sd["view_pool.E_score.bias"])
    vp["gating"]["weight"] = t2j(sd["view_pool.G.weight"]).reshape(-1)
    vp["gating"]["bias"] = t2j(sd["view_pool.G.bias"]).reshape(-1)
    variables["params"]["head"]["kernel"] = t2j(head.weight).T
    variables["params"]["head"]["bias"] = t2j(head.bias)

    if train:
        out, _ = model.apply(variables, batch, train=True,
                             mutable=["batch_stats"])
    else:
        out = model.apply(variables, batch, train=False)
    my_logp = np.asarray(jax.nn.log_softmax(out["logits"], axis=-1))
    my_seen = np.asarray(out["x_seen"])
    return ref_logp, ref_seen, my_logp, my_seen, x3d


@pytest.mark.parametrize("train", [False, True])
def test_no3d_model_logits_parity(refm, refp, reff, ri, ri2, train):
    """Full composed No3D forward: per-point log-probs ≤1e-5 in both BN
    modes, x_seen identical — tower INSIDE the branch INSIDE the block."""
    rng = np.random.default_rng(31)
    ref_logp, ref_seen, my_logp, my_seen, _ = _run_pair(
        refm, refp, reff, ri, ri2, rng, train)
    np.testing.assert_array_equal(my_seen, ref_seen)
    np.testing.assert_allclose(my_logp, ref_logp, **TOL)


def test_no3d_eval_unseen_propagation(refm, refp, reff, ri, ri2):
    """Eval-time unseen handling (no3d.py:105-126): every unseen point gets
    the log-probs of its nearest SEEN point.  The reference uses a KeOps
    1-NN; we replicate its exact formula in numpy and check this repo's
    ``propagate_unseen`` agrees on the same model outputs."""
    rng = np.random.default_rng(37)
    ref_logp, ref_seen, my_logp, my_seen, pos = _run_pair(
        refm, refp, reff, ri, ri2, rng, train=False, p_hi=N_PTS - 9)
    assert (~ref_seen).any() and ref_seen.any()

    # reference formula: argmin over squared distances to seen points
    d2 = ((pos[~ref_seen][:, None, :] - pos[ref_seen][None, :, :]) ** 2
          ).sum(-1)
    nn_idx = d2.argmin(1)
    want = ref_logp.copy()
    want[~ref_seen] = ref_logp[ref_seen][nn_idx]

    from deepviewagg_tpu.models.losses import propagate_unseen

    got = propagate_unseen(my_logp, pos, my_seen)
    np.testing.assert_allclose(got, want, **TOL)


# --------------------------------------------------------------------------
# Ingested published entry: ref:no3d/Res16UNet21-15_light executes with the
# parity-pinned scratch stack and matches the reference model end to end
# (VERDICT r4 missing #2 done-criterion).
# --------------------------------------------------------------------------

# the published light tower, stated literally from no3d.yaml:14-51
# (in_feat=32, in_feat_img=4, strided k/s/p = 2/2/0):
LIGHT_DOWN = ((4, 32, 3, 1, 1, 0), (32, 32, 2, 2, 0, 2),
              (32, 64, 2, 2, 0, 2), (64, 128, 2, 2, 0, 2),
              (128, 256, 2, 2, 0, 2))
LIGHT_UP = ((256, 128, 128, 2, 2, 0, 1), (128, 64, 96, 2, 2, 0, 1),
            (96, 32, 64, 2, 2, 0, 1), (64, 32, 32, 2, 2, 0, 1),
            (32, 0, 32, 3, 1, 1, 1))
NO3D_YAML = "/root/reference/conf/models/segmentation/multimodal/no3d.yaml"


@pytest.mark.parametrize("train", [False, True])
def test_ingested_light_entry_parity(refm, refp, reff, ri, ri2, train):
    """`ref:no3d/Res16UNet21-15_light` — the spec the CLI trains — builds the
    reference-exact scratch UNet (last_conv emits N_CLS logits, NO head,
    class no3d.No3DLogitFusion) and its composed forward matches the
    executed reference chain <=1e-5."""
    from deepviewagg_tpu.config.reference_ingest import load_model_spec

    spec = load_model_spec(NO3D_YAML, "Res16UNet21-15_light",
                           num_classes=N_CLS, in_channels=3)
    (lvl, b), = spec.branches
    # the ingested entry IS the parity-pinned stack with the published plan
    assert b.tower == "scratch_unet"
    assert b.tower_cfg == (LIGHT_DOWN, LIGHT_UP, N_CLS)
    assert b.tower_norm == "group" and b.tower_ws
    assert (b.out_channels, b.atomic_reduce, b.view_pool,
            b.interpolate) == (N_CLS, "max", "mean", False)
    assert spec.no3d_head is False

    # /16 for the four stride-2 stages; bottleneck 4x2 (reflect pad 1 needs
    # spatial dims >= 2)
    W2, H2 = 64, 32
    rng = np.random.default_rng(41)
    n_img, n_rows = 2, 260
    rows = _dense_rows(rng, n_img, W2, H2, n_rows)
    sid = _make_sid(ri, rng, rows, n_img, W2, H2, scale=1)
    # in_feat_img=4: RGB + pixel height (AddPixelHeightFeature)
    images_t = torch.from_numpy(
        rng.normal(size=(n_img, 4, H2, W2)).astype(np.float32))
    sid.x = images_t.clone()

    # --- reference: its own tower/branch/block, headless + log_softmax ----
    tower = _ref_tower_from_table(ri2, LIGHT_DOWN, LIGHT_UP, (32, N_CLS),
                                  seed=43)
    branch = refm.UnimodalBranch(
        tower,
        refp.BimodalCSRPool(mode="max"),
        refp.BimodalCSRPool(mode="mean"),
        reff.BimodalFusion(mode="modality"),
        interpolate=False)
    block = refm.MultimodalBlockDown(None, None, image=branch)
    block.train(train)
    x3d = rng.normal(size=(N_PTS, 3)).astype(np.float32)
    mm = {"x_3d": torch.from_numpy(x3d.copy()), "x_seen": None,
          "modalities": {"image": ri.ImageData([sid.clone()])}}
    with torch.no_grad():
        mm = block(mm)
        ref_logp = F.log_softmax(mm["x_3d"], dim=-1).numpy()
    ref_seen = mm["x_seen"].numpy()

    # --- this repo: the ingested spec with transplanted weights -----------
    # f32 towers for numeric comparison: tower_bf16=True is the deliberate
    # TPU production default, ~1e-2 off torch-f32 — not a fidelity signal
    spec = dataclasses.replace(
        spec, branches=((lvl, dataclasses.replace(b, tower_bf16=False)),))
    model = build_model(spec)
    images = jnp.asarray(images_t.numpy().transpose(0, 3, 2, 1))  # IWHC
    mapping = _flat_mapping([rows], [0])
    batch = {"feats": jnp.asarray(x3d), "images": images,
             "mappings": {0: mapping}}
    variables = unfreeze(model.init(jax.random.PRNGKey(0), batch,
                                    train=False))
    assert "head" not in variables["params"], "logit fusion has no head"
    copy_scratch_unet(tower.state_dict(),
                      variables["params"]["branch"]["tower"],
                      [r[-1] for r in LIGHT_DOWN],
                      [r[-1] for r in LIGHT_UP], wh=True)
    out = model.apply(variables, batch, train=train)
    my_logp = np.asarray(jax.nn.log_softmax(out["logits"], axis=-1))
    np.testing.assert_array_equal(np.asarray(out["x_seen"]), ref_seen)
    np.testing.assert_allclose(my_logp, ref_logp, **TOL)
    # LogitFusion + keep_last_view: the per-view logits the view loss
    # consumes are the pooled view values themselves (head = identity)
    assert out["view_logits"].shape[-1] == N_CLS
