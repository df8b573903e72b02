"""End-to-end pretrained 2D-tower loading.

The reference's flagship accuracy depends on pretrained towers (ADE20K /
Cityscapes ResNet18 — modules/multimodal/modalities/image.py:721-1398); the
named configs the paper publishes (``...-ade20k-interpolate``) load them at
model-build time.  Here: ``apply_tower_weights(variables, spec, path)``
converts a torch ``state_dict`` (utils/torch_convert.py) and overlays it on
every image branch of an initialized model — called by ``train.py`` when
``model.tower_weights`` is set, before the TrainState is built.

Pretrained towers require ``tower_norm='batch'`` (torch checkpoints carry
BatchNorm stats; our from-scratch default is GroupNorm+WS).  ``train.py``
flips the spec automatically.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from .torch_convert import (
    convert_ppm_head, convert_resnet18, load_torch_state_dict,
    merge_tower_params, strip_prefix,
)

__all__ = ["apply_tower_weights", "tower_param_path", "freeze_paths_for_spec"]

# towers that wrap the trunk in a submodule (ResNet18PPM / ResNet18Pyramid
# instantiate an inner ResNet18, flax auto-names it ResNet18_0)
_WRAPPED = {"resnet18_ppm": ("ResNet18_0",), "resnet18_pyramid": ("ResNet18_0",)}


def _branch_scope(spec, level: int, k: int = 0) -> str:
    """Flax scope of the image branch: MultimodalSeg names per-level
    ``branch_l{level}`` (``branch_l{level}_{k}`` for the k-th extra branch
    sharing a level, e.g. the five PointPyramid towers); the no3d /
    late-fusion families use one ``branch``."""
    if spec.family in ("no3d", "late_feature", "late_logit"):
        return "branch"
    return f"branch_l{level}" if k == 0 else f"branch_l{level}_{k}"


def iter_branches(spec):
    """(level, k, bspec) with k counting branches sharing a level."""
    counts = {}
    for level, b in spec.branches:
        k = counts.get(level, 0)
        counts[level] = k + 1
        yield level, k, b


def tower_param_path(spec, level: int, bspec, k: int = 0) -> Tuple[str, ...]:
    """Path of the trunk's parameter subtree inside the variables pytree."""
    return (_branch_scope(spec, level, k), "tower") + _WRAPPED.get(
        bspec.tower, ())


def freeze_paths_for_spec(spec):
    """Param-path prefixes to mask out of the optimizer for frozen towers."""
    return tuple(
        (_branch_scope(spec, level, k), "tower")
        for level, k, b in iter_branches(spec)
        if b.frozen
    )


def _out_level(tower: str) -> int:
    if tower.startswith("resnet18_l"):
        return int(tower[-1])
    return 4


def apply_tower_weights(variables, spec, path: str):
    """Overlay a torch ResNet18 checkpoint onto every image branch.

    ``variables``: the initialized ``{"params", "batch_stats"}`` tree.
    Raises if the towers were not built with ``tower_norm='batch'`` (the
    converted BN stats would have nowhere to land).
    """
    sd = load_torch_state_dict(path)
    for prefix in ("module.", "encoder.", "backbone."):
        sd = strip_prefix(sd, prefix)
    if not any(b.tower_norm == "batch" for _, b in spec.branches):
        raise ValueError(
            "pretrained tower weights need tower_norm='batch' on the branch "
            "spec (torch checkpoints carry BatchNorm statistics)"
        )
    deep = "conv3.weight" in sd  # MIT-semseg deep stem
    for level, k, b in iter_branches(spec):
        if deep != b.tower_deep_stem:
            raise ValueError(
                "checkpoint stem does not match the tower: "
                f"checkpoint deep_stem={deep} vs branch tower_deep_stem="
                f"{b.tower_deep_stem} (train.py sets this automatically "
                "from the checkpoint)"
            )
        params, stats = convert_resnet18(sd, out_level=_out_level(b.tower))
        tpath = tower_param_path(spec, level, b, k)
        variables = merge_tower_params(variables, tpath, params, stats)
        if b.tower == "resnet18_ppm":
            # PPM decoder weights ride in the same dict under decoder-style
            # prefixes (MIT ships encoder_/decoder_ checkpoints; a merged
            # dict or a decoder-only dict both work)
            dsd = sd
            for prefix in ("decoder.", "ppm_deepsup.", "ppm."):
                if any(k.startswith(prefix) for k in dsd):
                    dsd = strip_prefix(dsd, prefix)
                    if prefix == "ppm.":  # re-add: converter expects ppm.*
                        dsd = {f"ppm.{k}" if not k.startswith("conv_last")
                               else k: v for k, v in dsd.items()}
                    break
            if any(k.startswith("ppm.") for k in dsd):
                h_params, h_stats = convert_ppm_head(dsd)
                variables = merge_tower_params(
                    variables,
                    (_branch_scope(spec, level, k), "tower", "PPM_0"),
                    h_params, h_stats,
                )
    return variables


def tower_leaf_count(variables, spec) -> Dict[str, int]:
    """Diagnostic: number of param leaves per tower subtree (logged by
    train.py so silent no-op loads are visible)."""
    import jax

    out = {}
    for level, k, b in iter_branches(spec):
        node = variables["params"]
        for p in tower_param_path(spec, level, b, k):
            node = node.get(p, {})
        out["/".join(tower_param_path(spec, level, b, k))] = len(
            jax.tree_util.tree_leaves(node)
        )
    return out
