"""Separable-upsample bilinear gather == the 4-tap lerp, exactly.

The bilinear footprint at integer ref-resolution pixel coords is separable
(tap x depends only on pix_x, tap y only on pix_y), so
``_bilinear_upsampled`` (two resize matmuls + ONE row gather,
modules/gather.py) must reproduce ``_bilinear`` (4 tap gathers + lerp — the
form parity-pinned against the reference's ``sparse_interpolation``,
tests/test_reference_parity.py) bit-for-tolerance, values AND gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepviewagg_tpu.modules.gather import (_bilinear, _bilinear_upsampled,
                                            _resize_matrix, _use_upsample)


def _case(seed, i_cap, wf, hf, w, h, c=16, n=400):
    rng = np.random.default_rng(seed)
    maps = jnp.asarray(rng.normal(size=(i_cap, wf, hf, c)).astype(np.float32))
    img = jnp.asarray(rng.integers(0, i_cap, n).astype(np.int32))
    # integer pixel coords at REF resolution, incl. the borders where the
    # taps clamp (xf=-0.5 at x=0, xf=wf-0.5 at x=w-1)
    xi = jnp.asarray(rng.integers(0, w, n).astype(np.int32))
    yi = jnp.asarray(rng.integers(0, h, n).astype(np.int32))
    return maps, img, xi, yi


@pytest.mark.parametrize("wf,hf,w,h", [
    (16, 8, 64, 32),     # 4x upsample (the PPM-tower recipe regime)
    (24, 12, 64, 32),    # non-power-of-two ratio
    (64, 32, 48, 24),    # DOWNsample: ref coarser than the map
    (7, 5, 13, 11),      # odd everything
])
def test_upsampled_matches_taps(wf, hf, w, h):
    maps, img, xi, yi = _case(0, 3, wf, hf, w, h)
    xf = xi.astype(jnp.float32) / max(w - 1, 1) * wf - 0.5
    yf = yi.astype(jnp.float32) / max(h - 1, 1) * hf - 0.5
    want = _bilinear(maps, img, xf, yf)
    got = _bilinear_upsampled(maps, img, xi, yi, w, h)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=2e-5)


def test_upsampled_gradients_match_taps():
    maps, img, xi, yi = _case(1, 2, 16, 8, 64, 32, c=8, n=300)
    valid = jnp.asarray((np.arange(300) % 7 != 0))
    xf = xi.astype(jnp.float32) / 63 * 16 - 0.5
    yf = yi.astype(jnp.float32) / 31 * 8 - 0.5
    ct = jnp.asarray(np.random.default_rng(2).normal(size=(300, 8))
                     .astype(np.float32))

    def loss_taps(m):
        out = _bilinear(m, img, xf, yf) * valid[:, None]
        return jnp.sum(out * ct)

    def loss_up(m):
        return jnp.sum(_bilinear_upsampled(m, img, xi, yi, 64, 32,
                                           valid=valid) * ct)

    g_taps = jax.grad(loss_taps)(maps)
    g_up = jax.grad(loss_up)(maps)
    np.testing.assert_allclose(np.asarray(g_up), np.asarray(g_taps),
                               rtol=0, atol=3e-4)


def test_resize_matrix_rows_sum_to_one():
    for n_out, n_in in [(64, 16), (13, 7), (48, 64), (1, 4)]:
        mat = np.asarray(_resize_matrix(n_out, n_in))
        np.testing.assert_allclose(mat.sum(1), 1.0, atol=1e-6)
        assert (np.count_nonzero(mat, axis=1) <= 2).all()


def test_use_upsample_heuristic():
    # recipe bucket: 4 imgs upsampled to 1024x512x128 f32, 931k rows -> yes
    assert _use_upsample(4, 1024, 512, 128, 931_000, 4)
    # same shape, nearly empty mapping -> not worth the dense write
    assert not _use_upsample(4, 1024, 512, 128, 1_000, 4)
    # over the byte cap -> never
    assert not _use_upsample(64, 2048, 1024, 256, 10**9, 4)


def test_gather_pixel_features_routes_through_upsample(monkeypatch):
    """The public entry takes the upsample path when the heuristic says so
    and returns identical values either way."""
    from deepviewagg_tpu.modules import gather as G

    rng = np.random.default_rng(3)
    i_cap, wf, hf, w, h, c, n = 2, 8, 4, 32, 16, 4, 256
    maps = jnp.asarray(rng.normal(size=(i_cap, wf, hf, c)).astype(np.float32))
    mapping = {
        "pix_view": jnp.asarray(rng.integers(0, 4, n).astype(np.int32)),
        "pix_x": jnp.asarray(rng.integers(0, w, n).astype(np.int32)),
        "pix_y": jnp.asarray(rng.integers(0, h, n).astype(np.int32)),
        "pix_valid": jnp.asarray(np.ones(n, bool)),
        "view_valid": jnp.asarray(np.ones(4, bool)),
        "image_id": jnp.asarray(np.array([0, 1, 0, 1], np.int32)),
    }
    monkeypatch.setattr(G, "_use_upsample", lambda *a: True)
    up = G.gather_pixel_features(maps, mapping, (w, h))
    monkeypatch.setattr(G, "_use_upsample", lambda *a: False)
    taps = G.gather_pixel_features(maps, mapping, (w, h))
    np.testing.assert_allclose(np.asarray(up), np.asarray(taps), atol=2e-5)
