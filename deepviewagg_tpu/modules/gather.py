"""Gathering 2D feature-map values at mapped pixels.

The reference's ``get_mapped_features`` (core/multimodal/image.py:1262) with
its two modes:
  * nearest: integer-index the feature map at the (downscaled) mapping pixel;
  * bilinear ``sparse_interpolation`` (image.py:105-170): grid_sample
    semantics (``align_corners=False``) with per-row feature-map selection —
    keep mappings at the camera's reference resolution and sample coarser
    maps, the '-interpolate' flagship configs.

Pure gathers + lerps: XLA fuses these into the surrounding branch compute.

All taps index a FLATTENED ``[I*Wf*Hf, C]`` view with one precombined int32
row index (PERF.md "Round 4: flat-index pixel gathers").  A single
(2,2,C)-slice gather for the whole bilinear footprint was tried and
REVERTED: XLA-TPU lowers multi-dim slice gathers ~60x slower than row
gathers (1926 ms vs 24 ms fwd at the 931k-row recipe bucket — PERF.md
round 5), even though the same shape wins 2.5x on CPU.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

__all__ = ["gather_pixel_features"]

# The bilinear footprint is SEPARABLE: every tap x-coordinate depends only on
# pix_x and every y-coordinate only on pix_y, so the 4-tap gather+lerp equals
# one integer row gather from the dense upsample
#   UP = Rw @ maps @ Rh^T   (Rw [W, Wf], Rh [H, Hf] border-clamped bilinear
# resize matrices — two banded matmuls that run on the MXU).  That trades the
# gather engine's per-ROW issue cost (~6 cycles/row regardless of width,
# PERF.md round 4) for dense FLOPs the chip has idle: 4 tap gathers + 4
# backward scatters become 1 gather + 1 scatter.  Used when the upsampled
# buffer fits the byte cap and the mapping is dense enough that saved gather
# rows outweigh the dense write (see _use_upsample).
_UPSAMPLE_MAX_BYTES = int(1.6e9)


def _resize_matrix(n_out: int, n_in: int) -> jnp.ndarray:
    """[n_out, n_in] bilinear resize rows under the reference's
    ``sparse_interpolation`` coordinate convention (image.py:142-146):
    ``xf = x / (n_out - 1) * n_in - 0.5`` with border (replication) padding —
    out-of-range taps clamp to the edge while weights keep their unclamped
    distances, so clamped rows still sum to 1."""
    xf = np.arange(n_out, dtype=np.float64) / max(n_out - 1, 1) * n_in - 0.5
    x0 = np.floor(xf)
    t = (xf - x0).astype(np.float32)
    x0 = x0.astype(np.int64)
    rows = np.arange(n_out)
    mat = np.zeros((n_out, n_in), np.float32)
    np.add.at(mat, (rows, np.clip(x0, 0, n_in - 1)), 1.0 - t)
    np.add.at(mat, (rows, np.clip(x0 + 1, 0, n_in - 1)), t)
    return jnp.asarray(mat)


def _use_upsample(i_cap, w, h, c, n_rows, itemsize) -> bool:
    up_bytes = i_cap * w * h * c * itemsize
    if up_bytes > _UPSAMPLE_MAX_BYTES:
        return False
    # 3 saved gather rows (+3 backward scatters) per mapping row vs one dense
    # [I*W*H, C] write + matmul: worth it once rows are ~1/8 of up pixels
    return 3 * n_rows >= (i_cap * w * h) // 8


def _bilinear_upsampled(maps, img_id, xi, yi, w, h, valid=None):
    """Exact replacement for ``_bilinear`` at INTEGER ref-resolution pixel
    coords: dense separable upsample (two matmuls) + one row gather."""
    _, wf, hf, c = maps.shape
    up = jnp.einsum("aw,iwhc->iahc", _resize_matrix(w, wf), maps)
    up = jnp.einsum("bh,iahc->iabc", _resize_matrix(h, hf), up)
    flat = up.reshape(-1, c)
    idx = img_id * (w * h) + jnp.clip(xi, 0, w - 1) * h + jnp.clip(yi, 0, h - 1)
    out = flat[idx]
    if valid is not None:
        out = out * valid[:, None].astype(out.dtype)
    return out


def _bilinear(maps, img_id, xf, yf):
    """maps [I, W, H, C]; xf/yf float pixel coords in map units.

    Border (replication) padding outside the map — the reference
    ``sparse_interpolation`` default (image.py:105 ``padding_mode='border'``):
    out-of-range taps clamp to the edge pixel while the bilinear weights keep
    their unclamped distances."""
    _, w, h, _ = maps.shape
    flat = maps.reshape(-1, maps.shape[-1])
    base = img_id * (w * h)
    x0 = jnp.floor(xf).astype(jnp.int32)
    y0 = jnp.floor(yf).astype(jnp.int32)
    # weights in the MAP dtype: bf16 maps keep the whole lerp (and its
    # backward scatter-add) at half the HBM traffic instead of silently
    # promoting every tap product to f32
    tx = (xf - x0)[:, None].astype(maps.dtype)
    ty = (yf - y0)[:, None].astype(maps.dtype)

    def tap(xi, yi):
        return flat[base + jnp.clip(xi, 0, w - 1) * h + jnp.clip(yi, 0, h - 1)]

    return (
        tap(x0, y0) * (1 - tx) * (1 - ty)
        + tap(x0 + 1, y0) * tx * (1 - ty)
        + tap(x0, y0 + 1) * (1 - tx) * ty
        + tap(x0 + 1, y0 + 1) * tx * ty
    )


def gather_pixel_features(
    feature_maps,          # [I, Wf, Hf, C]
    mapping: dict,         # device mapping pytree (MultiViewMapping.to_device)
    ref_size,              # (W, H) of the mapping's pixel coordinates
    interpolate: bool = True,
):
    """Per-mapped-pixel features ``[Qc, C]`` (invalid rows -> 0).

    Pixel coords live at ``ref_size`` resolution; the feature map may be any
    resolution — scaling follows the reference's ``get_mapped_features``
    convention (image.py:1279-1283 + sparse_interpolation:142-146):
    ``coords = x / (W - 1)`` then ``xf = coords * Wf - 0.5`` in map space.

    At scale 1 the reference indexes pixels EXACTLY even when interpolation
    is on (``if interpolate and scale != 1``, image.py:1278-1284) — matched
    here, which also skips the 4-tap gather when resolutions agree.
    """
    i_cap, wf, hf, _ = feature_maps.shape
    w, h = ref_size
    vc = mapping["view_valid"].shape[0]
    pv = jnp.minimum(jnp.asarray(mapping["pix_view"]), vc - 1)
    # asarray: mapping fields may be host numpy closed over by a jitted fn
    img_id = jnp.asarray(mapping["image_id"])[pv]
    img_id = jnp.clip(img_id, 0, i_cap - 1)
    sx = wf / w
    sy = hf / h
    if interpolate and (wf, hf) == (w, h):
        interpolate = False
    if interpolate:
        px = jnp.asarray(mapping["pix_x"])
        py = jnp.asarray(mapping["pix_y"])
        if _use_upsample(i_cap, w, h, feature_maps.shape[-1], px.shape[0],
                         feature_maps.dtype.itemsize):
            return _bilinear_upsampled(
                feature_maps, img_id, px.astype(jnp.int32),
                py.astype(jnp.int32), w, h, valid=mapping["pix_valid"])
        xf = px.astype(jnp.float32) / max(w - 1, 1) * wf - 0.5
        yf = py.astype(jnp.float32) / max(h - 1, 1) * hf - 0.5
        out = _bilinear(feature_maps, img_id, xf, yf)
    else:
        xi = jnp.clip((mapping["pix_x"].astype(jnp.float32) * sx).astype(jnp.int32), 0, wf - 1)
        yi = jnp.clip((mapping["pix_y"].astype(jnp.float32) * sy).astype(jnp.int32), 0, hf - 1)
        flat = feature_maps.reshape(-1, feature_maps.shape[-1])
        out = flat[img_id * (wf * hf) + xi * hf + yi]
    return out * mapping["pix_valid"][:, None].astype(out.dtype)
