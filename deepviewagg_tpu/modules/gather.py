"""Gathering 2D feature-map values at mapped pixels.

The reference's ``get_mapped_features`` (core/multimodal/image.py:1262) with
its two modes:
  * nearest: integer-index the feature map at the (downscaled) mapping pixel;
  * bilinear ``sparse_interpolation`` (image.py:105-170): grid_sample
    semantics (``align_corners=False``) with per-row feature-map selection —
    keep mappings at the camera's reference resolution and sample coarser
    maps, the '-interpolate' flagship configs.

Pure gathers + lerps: XLA fuses these into the surrounding branch compute.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["gather_pixel_features"]


def _bilinear(maps, img_id, xf, yf):
    """maps [I, W, H, C]; xf/yf float pixel coords in map units."""
    _, w, h, _ = maps.shape
    x0 = jnp.floor(xf).astype(jnp.int32)
    y0 = jnp.floor(yf).astype(jnp.int32)
    tx = (xf - x0)[:, None]
    ty = (yf - y0)[:, None]

    def tap(xi, yi):
        xc = jnp.clip(xi, 0, w - 1)
        yc = jnp.clip(yi, 0, h - 1)
        # zero padding outside the map (reference default padding_mode='zeros')
        inside = ((xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)).astype(maps.dtype)
        return maps[img_id, xc, yc] * inside[:, None]

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
    resolution — scaling follows grid_sample's align_corners=False center
    convention: ``xf = (x + 0.5) * Wf / W - 0.5``.
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
    if interpolate:
        xf = (mapping["pix_x"].astype(jnp.float32) + 0.5) * sx - 0.5
        yf = (mapping["pix_y"].astype(jnp.float32) + 0.5) * sy - 0.5
        out = _bilinear(feature_maps, img_id, xf, yf)
    else:
        xi = jnp.clip((mapping["pix_x"].astype(jnp.float32) * sx).astype(jnp.int32), 0, wf - 1)
        yi = jnp.clip((mapping["pix_y"].astype(jnp.float32) * sy).astype(jnp.int32), 0, hf - 1)
        out = feature_maps[img_id, xi, yi]
    return out * mapping["pix_valid"][:, None].astype(out.dtype)
