"""Pretrained-tower wiring, end to end (VERDICT r1 item #2).

The converter parity is covered by test_torch_convert; here we check the
*glue*: a torch checkpoint on disk reaches the initialized model's branch
tower through ``apply_tower_weights`` (the ``model.tower_weights`` config
path), and ``frozen`` towers survive a training step bit-identically while
the rest of the model learns (ref modalities/image.py:721-957,737).
"""

import dataclasses

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402

from deepviewagg_tpu.data.toy import flagship_spec, toy_batch  # noqa: E402
from deepviewagg_tpu.models.segmentation import MultimodalSeg  # noqa: E402
from deepviewagg_tpu.train.trainer import Trainer, TrainerConfig  # noqa: E402
from deepviewagg_tpu.utils.pretrained import (  # noqa: E402
    apply_tower_weights, freeze_paths_for_spec, tower_param_path,
)

from test_torch_convert import TorchResNet18  # noqa: E402

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the fast tier


def _tiny_spec(frozen: bool = False):
    spec = flagship_spec(backbone="Res16UNetTest", tower="resnet18_l1",
                         num_groups=2)
    return dataclasses.replace(spec, branches=tuple(
        (lvl, dataclasses.replace(b, tower_norm="batch", frozen=frozen,
                                  remat_tower=False))
        for lvl, b in spec.branches
    ))


@pytest.fixture(scope="module")
def checkpoint_path(tmp_path_factory):
    torch.manual_seed(0)
    tm = TorchResNet18()
    p = tmp_path_factory.mktemp("ckpt") / "resnet18.pth"
    torch.save({"state_dict": tm.state_dict()}, p)
    return str(p)


@pytest.fixture(scope="module")
def tiny_batch():
    batch, bucket, _ = toy_batch(n_samples=1, density=25.0,
                                 image_size=(64, 32), n_cameras=1)
    return batch


def test_apply_tower_weights_reaches_branch(checkpoint_path, tiny_batch):
    spec = _tiny_spec()
    model = MultimodalSeg(spec)
    dev = {k: v for k, v in tiny_batch.items() if k != "meta"}
    variables = model.init(jax.random.PRNGKey(0), dev, train=False)
    variables = jax.device_get(variables)

    before = variables["params"]["branch_l0"]["tower"]["Conv2dWS_0"]["kernel"]
    variables = apply_tower_weights(variables, spec, checkpoint_path)
    after = variables["params"]["branch_l0"]["tower"]["Conv2dWS_0"]["kernel"]
    assert not np.allclose(before, after), "tower weights did not change"

    # the exact converted torch kernel must be in place (OIHW -> WHIO)
    sd = torch.load(checkpoint_path, weights_only=False)["state_dict"]
    want = np.transpose(sd["conv1.weight"].numpy(), (3, 2, 1, 0))
    np.testing.assert_array_equal(after, want)
    # BN running stats landed in batch_stats
    stats = variables["batch_stats"]["branch_l0"]["tower"]
    np.testing.assert_array_equal(
        stats["_Norm_0"]["BatchNorm_0"]["mean"], sd["bn1.running_mean"].numpy()
    )
    # model still runs with the merged tree
    out = model.apply(variables, dev, train=False)
    assert np.isfinite(np.asarray(out["logits"])).all()


def test_group_norm_tower_rejects_checkpoint(checkpoint_path, tiny_batch):
    spec = flagship_spec(backbone="Res16UNetTest", tower="resnet18_l1",
                         num_groups=2)  # default tower_norm='group'
    with pytest.raises(ValueError, match="batch"):
        apply_tower_weights({"params": {}, "batch_stats": {}}, spec,
                            checkpoint_path)


def test_frozen_tower_survives_training(checkpoint_path, tiny_batch):
    spec = _tiny_spec(frozen=True)
    model = MultimodalSeg(spec)
    cfg = TrainerConfig(
        epochs=1, base_lr=0.05, lr_schedule="constant", track_every=1,
        weight_decay=1e-2,  # large WD: catches decay leaking into frozen params
        freeze_paths=freeze_paths_for_spec(spec), log_fn=lambda s: None,
    )
    hook = lambda v: apply_tower_weights(v, spec, checkpoint_path)  # noqa: E731
    tr = Trainer(model, spec.num_classes, cfg, example_batch=tiny_batch,
                 variables_hook=hook)
    tpath = tower_param_path(spec, 0, dict(spec.branches)[0])

    def tower_tree(state):
        node = jax.device_get(state.params)
        for p in tpath:
            node = node[p]
        return node

    before = tower_tree(tr.state)
    stats_before = jax.device_get(tr.state.batch_stats)
    head_before = jax.device_get(tr.state.params)["head"]["kernel"]
    tr.fit(lambda: [tiny_batch] * 3, None)
    after = tower_tree(tr.state)

    for (kb, b), (ka, a) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(before), key=lambda t: str(t[0])),
        sorted(jax.tree_util.tree_leaves_with_path(after), key=lambda t: str(t[0])),
    ):
        np.testing.assert_array_equal(b, a, err_msg=str(kb))
    # frozen BN stats also untouched
    sb = stats_before["branch_l0"]["tower"]
    sa = jax.device_get(tr.state.batch_stats)["branch_l0"]["tower"]
    for b, a in zip(jax.tree_util.tree_leaves(sb),
                    jax.tree_util.tree_leaves(sa)):
        np.testing.assert_array_equal(b, a)
    # ...while the rest of the model actually trained
    head_after = jax.device_get(tr.state.params)["head"]["kernel"]
    assert not np.allclose(head_before, head_after)
    assert int(tr.state.step) == 3
