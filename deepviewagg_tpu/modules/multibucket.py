"""Multi-bucket image branch: crop-size families on device.

Device counterpart of :mod:`deepviewagg_tpu.data.crop_groups`: the batch
carries one image tensor + pixel table per crop-size bucket, all referencing
a single global view table.  The 2D tower (shared parameters) runs per
bucket; per-bucket atomic pools are summed into the global per-view features
— exact because each view's pixels live in exactly one bucket and empty
segments reduce to 0 (`ops/segment.py`).

This is the reference's ``ImageData``-of-``SameSettingImageData`` forward
(multi crop families per sample, modules/multimodal/modules.py:442-539 +
view_cat machinery image.py:1550-1616) in static-shape form.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..ops import segment as seg
from .fusion import BimodalFusion
from .pooling import GroupViewPool, SegmentPool

__all__ = ["MultiBucketBranch"]


class MultiBucketBranch(nn.Module):
    """Image branch over crop-group buckets.

    ``mm["view"]`` holds the global view table; ``mm["buckets"]`` a list of
    ``{images [Ib, w, h, 3], pix_view, pix_x, pix_y, pix_valid, pix_image}``
    — note pixels carry their local image index directly (no view->image
    lookup needed).
    """

    tower: Optional[Any]          # factory, shared across buckets
    out_channels: int
    atomic_reduce: str = "max"
    view_pool: str = "group"
    num_groups: int = 1
    gated: bool = True
    interpolate: bool = True
    fusion_mode: str = "residual"
    frozen: bool = False          # frozen pretrained tower (see branch.py)
    # rematerialize the tower in backward — the reference's 'c' checkpoint
    # flag (modules.py:283); at recipe-scale 2D (1024x512 crops) the stored
    # activations otherwise dominate HBM
    remat_tower: Any = False   # False | True | 'convs' (run_tower)
    tower_bf16: bool = True       # bf16 tower activations (see branch.py)
    # keep the pixel gather + atomic pool in bf16 (the HBM-bound stage at
    # recipe pixel counts); the per-view features upcast to f32 before the
    # view pool, so attention/fusion math is unchanged
    pool_bf16: bool = False

    @nn.compact
    def __call__(self, x_3d, mm: Dict, train: bool = True,
                 num_points: Optional[int] = None, bucket_images=None):
        """``bucket_images``: per-bucket image tensors shared across fusion
        levels (batch['bucket_images']); falls back to images embedded in
        the bucket dicts."""
        view = mm["view"]
        vc = view["view_valid"].shape[0]
        if x_3d is not None:
            num_points = x_3d.shape[0]

        tower = self.tower() if self.tower is not None else None
        partials = []
        for b, bucket in enumerate(mm["buckets"]):
            images = (bucket["images"] if "images" in bucket
                      else bucket_images[b])
            if images.shape[0] == 0:
                continue
            if tower is not None:
                from .image_encoders import run_tower

                feats_2d = run_tower(
                    tower, images, train, remat=self.remat_tower,
                    frozen=self.frozen, bf16=self.tower_bf16,
                    out_f32=not (self.pool_bf16 and self.tower_bf16),
                )
            else:
                feats_2d = images
            ref_size = (images.shape[1], images.shape[2])
            pix_feats = self._gather(feats_2d, bucket, ref_size)
            partial = seg.segment_reduce(
                pix_feats, bucket["pix_view"], vc + 1, self.atomic_reduce,
                valid=bucket["pix_valid"], ptr=bucket.get("pix_ptr"),
            )[:vc]
            partials.append(partial.astype(jnp.float32))
        assert partials, "no bucket carries images"
        x_view = sum(partials)

        pid = view["point_id"]
        p_ptr = view.get("point_ptr")
        v_valid = view["view_valid"]
        if self.view_pool == "group":
            pooled, _ = GroupViewPool(
                self.out_channels, num_groups=self.num_groups,
                gated=self.gated, name="view_pool",
            )(x_view, view["view_feats"], pid, v_valid, num_points + 1,
              train=train, ptr=p_ptr)
        else:
            pooled = SegmentPool(self.view_pool, name="view_pool")(
                x_view, pid, v_valid, num_points + 1, train=train, ptr=p_ptr
            )
        pooled = pooled[:num_points]
        n_views = seg.segment_count(pid, num_points + 1, v_valid)[:num_points]
        x_seen = n_views > 0
        if x_3d is None:
            return pooled, x_seen
        return BimodalFusion(self.fusion_mode, name="fusion")(x_3d, pooled), x_seen

    @staticmethod
    def _gather(feature_maps, bucket, ref_size):
        """Bilinear sample at pixel coords with a per-pixel image index —
        same convention as :func:`modules.gather.gather_pixel_features`
        (ref sparse_interpolation, image.py:105-170: coords / (size - 1),
        scale by the feature-map size, border padding; EXACT indexing at
        scale 1 per the reference's ``interpolate and scale != 1`` guard).

        Scale-1 fast path: flat-index rows on a ``[I*Wf*Hf, C]`` view
        (PERF.md "Round 4: flat-index pixel gathers"); bilinear path: 4
        flat-index tap gathers shared with :func:`modules.gather._bilinear`
        (a (2,2,C)-patch gather was tried and reverted — 60x slower on
        TPU, PERF.md round 5)."""
        i_cap, wf, hf, _ = feature_maps.shape
        w, h = ref_size
        img_id = jnp.clip(jnp.asarray(bucket["pix_image"]), 0, i_cap - 1)
        flat = feature_maps.reshape(-1, feature_maps.shape[-1])
        base = img_id * (wf * hf)
        if (wf, hf) == (w, h):
            idx = base + jnp.asarray(bucket["pix_x"]) * hf \
                + jnp.asarray(bucket["pix_y"])
            out = flat[idx]
            return out * jnp.asarray(
                bucket["pix_valid"])[:, None].astype(out.dtype)
        from .gather import _bilinear, _bilinear_upsampled, _use_upsample

        px = jnp.asarray(bucket["pix_x"])
        py = jnp.asarray(bucket["pix_y"])
        valid = jnp.asarray(bucket["pix_valid"])
        if _use_upsample(i_cap, w, h, feature_maps.shape[-1], px.shape[0],
                         feature_maps.dtype.itemsize):
            # separable upsample + ONE row gather (gather.py) — the 4 tap
            # gathers + 4 backward scatters were ~55% of the recipe step
            return _bilinear_upsampled(
                feature_maps, img_id, px.astype(jnp.int32),
                py.astype(jnp.int32), w, h, valid=valid)
        xf = px.astype(jnp.float32) / max(w - 1, 1) * wf - 0.5
        yf = py.astype(jnp.float32) / max(h - 1, 1) * hf - 0.5
        out = _bilinear(feature_maps, img_id, xf, yf)
        return out * valid[:, None].astype(out.dtype)