"""ModelInference transform: a trained 3D checkpoint as a feature extractor
(ref core/data_transform/inference_transforms.py:11-86)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # trains + restores a checkpoint; compile-heavy


@pytest.fixture(scope="module")
def tiny_run(tmp_path_factory):
    """Train a tiny 3D-only model for one step and checkpoint it."""
    import jax

    from deepviewagg_tpu.config import load_run_config, resolve_spec_from_cfg
    from deepviewagg_tpu.data.collate import Bucket, Sample, collate, device_view
    from deepviewagg_tpu.models.segmentation import build_model
    from deepviewagg_tpu.train.checkpoint import CheckpointManager
    from deepviewagg_tpu.train.optimizers import make_optimizer, make_schedule
    from deepviewagg_tpu.train.step import TrainState

    run_dir = str(tmp_path_factory.mktemp("mi_run"))
    cfg = load_run_config(None, [
        "model.name=Res16UNetTest", "data.num_classes=4",
        "data.voxel_size=0.2",
    ])
    spec = resolve_spec_from_cfg(cfg.model, 4)
    model = build_model(spec)

    rng = np.random.default_rng(0)
    n = 300
    coords = (rng.random((n, 3)) * 12).astype(np.int32)
    sample = Sample(coords=coords,
                    feats=rng.random((n, 4)).astype(np.float32),
                    labels=rng.integers(0, 4, n).astype(np.int32))
    bucket = Bucket(level_caps=[512, 256, 256, 256, 256], num_batches=1)
    batch = device_view(collate([sample], bucket,
                                conv0_kernel=spec.stem_kernel))
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    tx = make_optimizer(make_schedule("constant", 0.1))
    state = TrainState.create(variables, tx)

    import dataclasses, json, os
    ckpt = CheckpointManager(run_dir, dataclasses.asdict(cfg))
    ckpt.save_state("latest", state)
    assert os.path.exists(os.path.join(run_dir, "run.json"))
    return run_dir


def test_model_inference_attaches_features(tiny_run):
    from deepviewagg_tpu.data.inference_transform import ModelInference

    rng = np.random.default_rng(1)
    n = 500
    cloud = {"pos": (rng.random((n, 3)) * 2.5).astype(np.float32),
             "rgb": rng.random((n, 3)).astype(np.float32)}
    t = ModelInference(tiny_run, feat_name="pn_feat", output="logits")
    out = t(cloud)
    assert out["pn_feat"].shape == (len(out["coords"]), 4)
    assert np.isfinite(out["pn_feat"]).all()

    # program cache: second call with a similar-size cloud reuses the program
    cloud2 = {"pos": (rng.random((n, 3)) * 2.5).astype(np.float32),
              "rgb": rng.random((n, 3)).astype(np.float32)}
    out2 = t(cloud2)
    assert len(t._programs) == 1
    assert out2["pn_feat"].shape[1] == 4

    t_lab = ModelInference(tiny_run, feat_name="pred", output="labels")
    out3 = t_lab(cloud)
    assert out3["pred"].dtype == np.int32
    assert set(np.unique(out3["pred"])) <= {0, 1, 2, 3}


def test_model_inference_rejects_multimodal(tiny_run, tmp_path):
    import json, os, shutil

    from deepviewagg_tpu.data.inference_transform import ModelInference

    mm_dir = str(tmp_path / "mm_run")
    shutil.copytree(tiny_run, mm_dir)
    stored = json.load(open(os.path.join(mm_dir, "run.json")))
    stored["model"]["name"] = "Res16UNet34-L4-early"
    json.dump(stored, open(os.path.join(mm_dir, "run.json"), "w"))
    with pytest.raises(ValueError):
        ModelInference(mm_dir)
