"""Visualization exports + metric logging round-trips."""

import json
import os

import numpy as np

from deepviewagg_tpu.data import synthetic
from deepviewagg_tpu.data.mapping_factory import VisibilityParams, build_mappings
from deepviewagg_tpu.utils.logging import MetricLogger, git_info
from deepviewagg_tpu.utils.ply import read_ply
from deepviewagg_tpu.visualization import export_html, save_ply_snapshot


def test_ply_snapshot(tmp_path, rng):
    pos = rng.normal(size=(50, 3)).astype(np.float32)
    p = str(tmp_path / "snap.ply")
    save_ply_snapshot(p, pos, rgb=rng.uniform(0, 1, (50, 3)),
                      labels=rng.integers(0, 4, 50),
                      preds=rng.integers(0, 4, 50))
    back = read_ply(p)
    np.testing.assert_allclose(back["x"], pos[:, 0])
    assert "pred" in back and "label" in back


def test_export_html(tmp_path):
    scene = synthetic.make_scene(seed=2, density=40.0, n_cameras=1,
                                 image_size=(64, 32))
    m = build_mappings(scene.pos, scene.cameras,
                       VisibilityParams(voxel=0.15, max_splat=4))
    imgs = synthetic.render_views(scene, m)
    p = export_html(
        str(tmp_path / "v.html"), scene.pos, rgb=scene.rgb,
        labels=scene.labels, images=imgs, mapping=m, max_points=2000,
    )
    html = open(p).read()
    assert "deepviewagg viewer" in html
    assert "data:image/png;base64," in html
    assert html.count("__DATA__") == 0


def test_metric_logger(tmp_path):
    lg = MetricLogger(str(tmp_path), use_tensorboard=False)
    lg.log({"train_loss": 1.5, "val_miou": 42.0}, step=1)
    lg.log({"train_loss": 1.2}, step=2)
    lg.close()
    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert lines[0]["val_miou"] == 42.0 and lines[1]["step"] == 2
    info = git_info("/root/repo")
    assert "sha" in info and len(info["sha"]) == 40
