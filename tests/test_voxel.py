import numpy as np

from deepviewagg_tpu.ops import voxel


def test_unique_coords_roundtrip(rng):
    coords = rng.integers(-5, 5, size=(100, 4)).astype(np.int32)
    coords[:, 0] = rng.integers(0, 3, 100)
    u, inv = voxel.unique_coords(coords)
    np.testing.assert_array_equal(u[inv], coords)
    # unique rows really are unique
    assert len(np.unique(voxel.ravel_coords(u))) == len(u)


def test_query_coords(rng):
    table = np.array([[0, 1, 2, 3], [0, -1, 0, 0], [1, 5, 5, 5]], np.int32)
    q = np.array([[0, -1, 0, 0], [1, 5, 5, 5], [0, 9, 9, 9]], np.int32)
    hit = voxel.query_coords(table, q)
    np.testing.assert_array_equal(hit, [1, 2, -1])


def test_grid_sample_mean_and_labels(rng):
    pos = np.array([[0.01, 0.0, 0.0], [0.04, 0.0, 0.0], [0.5, 0.5, 0.5]])
    feats = np.array([[1.0], [3.0], [10.0]])
    labels = np.array([2, 2, 7])
    out = voxel.grid_sample(pos, 0.1, feats=feats, labels=labels, mode="mean")
    assert out["coords"].shape[0] == 2
    # first voxel: mean of feats 1,3
    i0 = out["inverse"][0]
    np.testing.assert_allclose(out["feats"][i0], [2.0])
    assert out["labels"][i0] == 2
    assert out["labels"][out["inverse"][2]] == 7


def test_grid_sample_ignore_labels():
    pos = np.zeros((3, 3))
    labels = np.array([-1, -1, 4])
    out = voxel.grid_sample(pos, 0.1, labels=labels)
    assert out["labels"][0] == 4
    out2 = voxel.grid_sample(pos, 0.1, labels=np.array([-1, -1, -1]))
    assert out2["labels"][0] == -1


def test_downsample_coords():
    coords = np.array(
        [[0, 0, 0, 0], [0, 1, 1, 1], [0, 2, 2, 2], [0, 3, 3, 3]], np.int32
    )
    out, parent = voxel.downsample_coords(coords, 2)
    assert len(out) == 2
    # voxels 0,1 merge; 2,3 merge
    assert parent[0] == parent[1]
    assert parent[2] == parent[3]
    assert parent[0] != parent[2]
    # coords stay in level-0 units (multiples of stride)
    assert set(out[:, 1].tolist()) == {0, 2}
