"""Round-2 family stragglers (VERDICT item #10): PPNet/PosPool, plain
PointNet, MinMaxDiffSetFeat, dilated + multiscale neighbour finders."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepviewagg_tpu.data import synthetic
from deepviewagg_tpu.ops.knn import dilated_knn, knn
from deepviewagg_tpu.ops.spatial import ball_query, multiscale_ball_query

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the fast tier


@pytest.fixture(scope="module")
def cloud():
    sc = synthetic.make_scene(seed=5, density=40.0, n_cameras=1,
                              image_size=(32, 16))
    rng = np.random.default_rng(0)
    take = rng.choice(len(sc.pos), 1500, replace=False)
    return sc.pos[take], sc.rgb[take], sc.labels[take]


def test_dilated_knn_widens_receptive_field(cloud):
    pos, _, _ = cloud
    q = pos[:32]
    d_plain, i_plain = knn(q, pos, k=8)
    d_dil, i_dil = dilated_knn(q, pos, k=8, dilation=4,
                               rng=np.random.default_rng(0))
    assert i_dil.shape == (32, 8)
    # dilated picks live inside the k*dilation ring: max distance grows,
    # every pick is within the 32-NN set
    assert float(np.sqrt(d_dil).max()) >= float(np.sqrt(d_plain).max())
    d32, i32 = knn(q, pos, k=32)
    for r in range(32):
        assert set(i_dil[r]) <= set(i32[r])
    # dilation=1 degenerates to plain knn
    d1, i1 = dilated_knn(q, pos, k=8, dilation=1)
    np.testing.assert_array_equal(i1, i_plain)


def test_multiscale_ball_query_matches_per_scale(cloud):
    pos, _, _ = cloud
    q = pos[:16]
    ms = multiscale_ball_query(q, pos, [0.3, 0.8], [8, 16])
    assert len(ms) == 2
    for (idx, cnt), (r, k) in zip(ms, [(0.3, 8), (0.8, 16)]):
        ref_idx, ref_cnt = ball_query(q, pos, r, k)
        np.testing.assert_array_equal(idx, ref_idx)
        np.testing.assert_array_equal(cnt, ref_cnt)
    # bigger radius never sees fewer neighbors
    assert (ms[1][1] >= np.minimum(ms[0][1], 8)).all()


def test_minmaxdiff_set_encoder_in_group_pool(cloud):
    from deepviewagg_tpu.modules.pooling import GroupViewPool, MinMaxDiffSetFeat

    rng = np.random.default_rng(1)
    e, s = 64, 10
    x = rng.normal(size=(e, 8)).astype(np.float32)
    seg_ids = np.sort(rng.integers(0, s, e)).astype(np.int32)
    valid = np.ones(e, bool)

    enc = MinMaxDiffSetFeat(16, use_num=True)
    v = enc.init(jax.random.PRNGKey(0), x, seg_ids, valid, s + 1)
    out = enc.apply(v, x, seg_ids, valid, s + 1, train=False)
    assert out.shape == (e, 16) and np.isfinite(np.asarray(out)).all()

    pool = GroupViewPool(16, num_groups=4, set_encoder="minmaxdiff")
    xv = rng.normal(size=(e, 16)).astype(np.float32)
    v = pool.init(jax.random.PRNGKey(1), xv, x, seg_ids, valid, s + 1)
    pooled, attn = pool.apply(v, xv, x, seg_ids, valid, s + 1, train=False)
    assert pooled.shape == (s + 1, 16)
    assert np.isfinite(np.asarray(pooled)).all()


def _pn_batch(cloud, num_batches=1):
    from deepviewagg_tpu.data.collate import Bucket, Sample, collate, device_view

    pos, rgb, labels = cloud
    from deepviewagg_tpu.ops import voxel as _voxel

    g = _voxel.grid_sample(pos, 0.1, feats=rgb, labels=labels)
    s = Sample(coords=g["coords"][:, 1:],
               feats=np.concatenate([g["feats"],
                                     np.ones((len(g["pos"]), 1), np.float32)],
                                    1),
               labels=g["labels"], pos=g["pos"])
    bucket = Bucket(level_caps=[2048, 2048, 1024, 512, 256],
                    num_batches=num_batches)
    return device_view(collate([s], bucket, conv0_kernel=3))


def test_plain_pointnet_cls_and_seg(cloud):
    from deepviewagg_tpu.nn.pointnet import PointNetCls, PointNetSeg

    batch = _pn_batch(cloud)
    cls = PointNetCls(num_classes=5, num_batches=1)
    v = cls.init(jax.random.PRNGKey(0), batch, train=False)
    out = cls.apply(v, batch, train=False)
    assert out["logits"].shape == (1, 5)
    assert np.isfinite(np.asarray(out["logits"])).all()

    seg = PointNetSeg(num_classes=5, num_batches=1)
    v = seg.init(jax.random.PRNGKey(0), batch, train=False)
    out = seg.apply(v, batch, train=False)
    assert out["logits"].shape == (batch["feats"].shape[0], 5)
    assert np.isfinite(np.asarray(out["logits"])).all()


def test_ppnet_forward_and_learns(cloud):
    import optax

    from deepviewagg_tpu.nn.pointnet2 import build_pointnet_graph
    from deepviewagg_tpu.nn.ppnet import PPNetSeg

    pos, rgb, labels = cloud
    n = len(pos)
    graph = build_pointnet_graph(pos, np.zeros(n, np.int32),
                                 np.ones(n, bool), n_points=(512, 128),
                                 radii=(0.4, 0.8), k=16, self_k=8)
    feats = np.concatenate([rgb, np.ones((n, 1), np.float32)], 1)
    batch = {"pn_graph": graph, "feats": jnp.asarray(feats),
             "valid": jnp.ones(n, bool)}
    model = PPNetSeg(num_classes=4, channels=(24, 48), radii=(0.4, 0.8))
    v = model.init(jax.random.PRNGKey(0), batch, train=False)
    out = model.apply(v, batch, train=False)
    assert out["logits"].shape == (n, 4)
    assert np.isfinite(np.asarray(out["logits"])).all()

    # a few steps reduce CE on the synthetic labels
    y = jnp.asarray(labels)
    tx = optax.adam(3e-3)
    st = tx.init(v["params"])
    p = v["params"]

    @jax.jit
    def step(p, st):
        def loss_fn(p):
            o, upd = jax.tree_util.Partial(model.apply)(
                {"params": p, "batch_stats": v["batch_stats"]}, batch,
                train=True, mutable=["batch_stats"],
            )
            lp = jax.nn.log_softmax(o["logits"])
            return -jnp.mean(jnp.take_along_axis(lp, y[:, None], 1))
        l, g = jax.value_and_grad(loss_fn)(p)
        upd, st2 = tx.update(g, st)
        return optax.apply_updates(p, upd), st2, l

    losses = []
    for _ in range(8):
        p, st, l = step(p, st)
        losses.append(float(l))
    assert losses[-1] < losses[0], losses
