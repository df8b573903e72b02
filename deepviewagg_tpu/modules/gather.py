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

import jax.numpy as jnp

__all__ = ["gather_pixel_features"]


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
        xf = mapping["pix_x"].astype(jnp.float32) / max(w - 1, 1) * wf - 0.5
        yf = mapping["pix_y"].astype(jnp.float32) / max(h - 1, 1) * hf - 0.5
        out = _bilinear(feature_maps, img_id, xf, yf)
    else:
        xi = jnp.clip((mapping["pix_x"].astype(jnp.float32) * sx).astype(jnp.int32), 0, wf - 1)
        yi = jnp.clip((mapping["pix_y"].astype(jnp.float32) * sy).astype(jnp.int32), 0, hf - 1)
        flat = feature_maps.reshape(-1, feature_maps.shape[-1])
        out = flat[img_id * (wf * hf) + xi * hf + yi]
    return out * mapping["pix_valid"][:, None].astype(out.dtype)
