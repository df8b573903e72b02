"""Transform-fidelity audit (VERDICT r2 #7): pin every shared transform's
default parameters to the reference-cited values so silent 10x divergences
(like the r2 ElasticDistortion magnitudes) cannot recur.

Each row: (callable, {param: reference default}, "reference file:line").
"""

import inspect

import pytest

from deepviewagg_tpu.data import transforms2d as t2
from deepviewagg_tpu.data import transforms3d as t3

CASES = [
    (t3.RandomNoise, {"sigma": 0.01, "clip": 0.05},
     "core/data_transform/transforms.py:499"),
    (t3.RandomSymmetry, {"axes": (False, False, False)},
     "transforms.py:463 (axis=[False]*3)"),
    (t3.ElasticDistortion, {"granularity": (0.2, 0.8),
                            "magnitude": (0.4, 1.6)},
     "grid_transform.py:211"),
    (t3.RandomDropout, {"dropout_ratio": 0.2, "p": 0.5},
     "transforms.py:737 (dropout_application_ratio)"),
    (t3.RandomWalkDropout, {"dropout_ratio": 0.05, "num_iter": 5000},
     "transforms.py:796-800"),
    (t3.RandomSphereDropout, {"num_sphere": 10, "radius": 5.0},
     "transforms.py:848"),
    (t3.SphereCrop, {"radius": 50.0}, "transforms.py:922"),
    (t3.ChromaticTranslation, {"trans_range_ratio": 0.1, "p": 0.95},
     "feature_augment.py:37 + inline p :43"),
    (t3.ChromaticAutoContrast, {"randomize_blend_factor": True,
                                "blend_factor": 0.5, "p": 0.2},
     "feature_augment.py:63 + inline p :70"),
    (t3.ChromaticJitter, {"std": 0.01, "p": 0.95},
     "feature_augment.py:99 + inline p :105"),
    (t3.DropFeature, {"drop_proba": 0.2, "feature_name": "rgb"},
     "feature_augment.py:126"),
    (t3.PeriodicSampling, {"period": 0.1, "prop": 0.1},
     "transforms.py:1100"),
    (t2.jitter_mapping_features, {"sigma": 0.02, "clip": 0.03},
     "data_transform/multimodal/image.py:945"),
    (t2.center_roll, {"angular_res": 16},
     "data_transform/multimodal/image.py:973"),
]


def _defaults(fn):
    target = fn.__init__ if inspect.isclass(fn) else fn
    return {
        k: v.default
        for k, v in inspect.signature(target).parameters.items()
        if v.default is not inspect.Parameter.empty
    }


@pytest.mark.parametrize(
    "fn,expected,cite", CASES,
    ids=[c[0].__name__ for c in CASES])
def test_default_matches_reference(fn, expected, cite):
    got = _defaults(fn)
    for param, want in expected.items():
        assert param in got, f"{fn.__name__} lost parameter {param} ({cite})"
        assert got[param] == want, (
            f"{fn.__name__}.{param} default {got[param]!r} != reference "
            f"{want!r} ({cite})"
        )


def test_s3dis_augment_chain_matches_recipe():
    """s3disfused-sparse.yaml:46-59: noise 0.001, full z-rotation,
    anisotropic scale [0.8, 1.2], x-symmetry."""
    from deepviewagg_tpu.data.datasets.s3dis import default_augment

    chain = default_augment().transforms
    kinds = [type(t).__name__ for t in chain]
    assert kinds == ["RandomNoise", "RandomRotate", "RandomScaleAnisotropic",
                     "RandomSymmetry"]
    assert chain[0].sigma == 0.001
    assert chain[2].lo == 0.8 and chain[2].hi == 1.2
    assert tuple(chain[3].axes) == (True, False, False)
