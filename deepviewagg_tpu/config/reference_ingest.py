"""Ingest the reference's published Hydra YAMLs into this framework.

The reference's model zoo is an architecture DSL (``down_conv`` lists with
``define_constants`` arithmetic, per-modality subtrees, ``branching_index``
— models/base_architectures/unet.py:402-552, resolved by
utils/model_building_utils/model_definition_resolver.py).  This module reads
those files directly:

  * :func:`load_model_spec` — one named entry of
    ``conf/models/segmentation/multimodal/{sparseconv3d,no3d}.yaml`` ->
    :class:`ModelSpec`;
  * :func:`load_data_cfg` — a multimodal data YAML
    (``s3disfused-sparse.yaml``...) -> the ``data`` section fields of
    :class:`RunConfig`.

This makes the "config-space contract" executable: the published recipes
resolve to the same specs the zoo grammar produces (tests/test_reference_ingest.py).
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

import yaml

from ..models.segmentation import BranchSpec, ModelSpec

__all__ = ["load_model_spec", "load_data_cfg", "resolve_constant"]


# reference 2D encoder class names -> (this repo's tower, deep_stem)
# (modules/multimodal/modalities/image.py:721-1398; MIT-semseg ADE20K and
# Cityscapes encoders use the deep 3-conv stem, torchvision ImageNet the
# plain 7x7 stem)
def _tower_of(module_name: str) -> Tuple[str, bool]:
    m = re.match(r"^(ADE20K|Cityscapes|)ResNet18"
                 r"(?:Truncated)?(?:Layer)?(\d)?(PPM|Pyramid)?$",
                 module_name)
    if not m:
        raise KeyError(f"unknown 2D encoder '{module_name}'")
    src, layer, kind = m.group(1), m.group(2), m.group(3)
    deep = src in ("ADE20K", "Cityscapes")
    if kind == "PPM":
        return "resnet18_ppm", deep
    if kind == "Pyramid":
        return "resnet18_pyramid", deep
    return f"resnet18_l{layer or 4}", deep


_BACKBONES = {
    (1, 1, 1, 1): "Res16UNet14",
    (2, 2, 2, 2): "Res16UNet18",
    (2, 3, 4, 6): "Res16UNet34",
}


def resolve_constant(val, constants: Dict, feat: Optional[int] = None):
    """Evaluate a ``define_constants`` expression — the role of
    ``model_definition_resolver.resolve_model`` (FEAT arithmetic,
    ``4*in_feat``-style strings)."""
    if isinstance(val, (int, float)):
        return val
    if isinstance(val, list):
        return [resolve_constant(v, constants, feat) for v in val]
    if not isinstance(val, str):
        return val
    env = dict(constants)
    if feat is not None:
        env.setdefault("FEAT", feat)
        env.setdefault("N_CLS", feat)
    # expressions are simple arithmetic over named constants
    if not re.fullmatch(r"[\w\s+\-*/().]+", val):
        return val
    try:
        return eval(val, {"__builtins__": {}}, env)  # noqa: S307
    except Exception:
        return val


def _as_list(v, n: int) -> List:
    return list(v) if isinstance(v, list) else [v] * n


def load_model_entry(path: str, name: str) -> Dict:
    with open(path) as f:
        doc = yaml.safe_load(f)
    if name not in doc:
        raise KeyError(f"entry '{name}' not in {path}")
    return doc[name]


def load_model_spec(path: str, name: str, num_classes: int,
                    in_channels: int = 4) -> ModelSpec:
    """One published model entry -> ModelSpec.

    Covers the multimodal sparseconv3d families (early/pyramid truncation
    branches over a Res16UNet) and the no3d families (2D-tower-only).
    """
    entry = load_model_entry(path, name)
    cls = entry.get("class", "")
    if cls.startswith("no3d."):
        return _no3d_spec(entry, num_classes, in_channels)
    bb = entry.get("backbone", entry)
    constants = dict(bb.get("define_constants", {}))
    down = bb["down_conv"]
    up = bb.get("up_conv", {})

    # infer the Res16UNet preset from the residual-block counts
    enc_n = tuple(int(x) for x in down.get("N", [])[1:])
    backbone = _BACKBONES.get(enc_n, "Res16UNet34")
    stem_kernel = int(_as_list(down.get("kernel_size", [3]), 1)[0])

    img = down.get("image")
    branches: List[Tuple[int, BranchSpec]] = []
    if img is not None:
        towers = _as_list(img["down_conv"]["module_name"], 1)
        n = len(towers)
        bidx = _as_list(img.get("branching_index", 0), n)
        n_early = int(down.get("n_early_conv", 1))
        vp = img.get("view_pooling", {})
        ap = img.get("atomic_pooling", {})
        fu = img.get("fusion", {})
        in_mod = _as_list(vp.get("in_mod"), n)
        out_mod = _as_list(vp.get("out_mod", vp.get("in_mod")), n)
        groups = _as_list(vp.get("num_groups", 1), n)
        pool_name = vp.get("module_name", "BimodalCSRPool")
        view_pool = {
            "GroupBimodalCSRPool": "group",
            "QKVBimodalCSRPool": "qkv",
            "HeuristicBimodalCSRPool": "heuristic",
        }.get(pool_name, vp.get("mode", "max"))
        fusion = {"concatenation": "concat"}.get(
            fu.get("mode", "residual"), fu.get("mode", "residual"))
        for i in range(n):
            tower, deep = _tower_of(towers[i])
            # early positions (indices < n_early_conv) all sit pre-stem at
            # UNet level 0; later indices attach after down stage k
            level = max(0, int(bidx[i]) - (n_early - 1)) if n_early > 1 \
                else int(bidx[i])
            out_c = resolve_constant(out_mod[i], constants, in_channels)
            if out_c is None:
                out_c = resolve_constant(in_mod[i], constants, in_channels)
            branches.append((level, BranchSpec(
                tower=tower,
                out_channels=int(out_c),
                atomic_reduce=ap.get("mode", "max"),
                view_pool=view_pool,
                num_groups=int(resolve_constant(groups[i], constants) or 1),
                use_mod=bool(vp.get("use_mod", False)),
                gated=bool(vp.get("gating", True)),
                interpolate=bool(img.get("interpolate", False)),
                fusion_mode=fusion,
                tower_deep_stem=deep,
            )))
    return ModelSpec(
        num_classes=num_classes,
        in_channels=in_channels,
        backbone=backbone,
        branches=tuple(branches),
        stem_kernel=stem_kernel,
    )


def _no3d_spec(entry: Dict, num_classes: int, in_channels: int) -> ModelSpec:
    img = entry["down_conv"]["image"]
    constants = dict(entry.get("define_constants", {}))
    ap = img.get("atomic_pooling", {})
    vp = img.get("view_pooling", {})
    pool_name = vp.get("module_name", "BimodalCSRPool")
    view_pool = {
        "GroupBimodalCSRPool": "group",
        "QKVBimodalCSRPool": "qkv",
    }.get(pool_name, vp.get("mode", "mean"))
    tower_mod = img["down_conv"].get("module_name", "ResNetDown")
    if tower_mod == "ResNetDown" and "up_conv" in img:
        tower, deep = "unet2d_light", False    # the light 2D UNet family
        out_c = resolve_constant(
            img.get("last_conv", {}).get("input_nc", 32), constants)
    else:
        tower, deep = _tower_of(tower_mod)
        out_c = resolve_constant(vp.get("out_mod", vp.get("in_mod", 64)),
                                 constants)
    return ModelSpec(
        num_classes=num_classes,
        in_channels=in_channels,
        family="no3d",
        branches=((0, BranchSpec(
            tower=tower,
            out_channels=int(out_c or 32),
            atomic_reduce=ap.get("mode", "max"),
            view_pool=view_pool,
            num_groups=int(resolve_constant(vp.get("num_groups", 1),
                                            constants) or 1),
            gated=bool(vp.get("gating", True)),
            interpolate=bool(img.get("interpolate", True)),
            tower_deep_stem=deep,
        )),),
    )


def load_data_cfg(path: str) -> Dict:
    """A published multimodal data YAML -> ``cfg.data`` field dict.

    Maps: ``first_subsampling``/``resolution_3d`` -> voxel_size;
    ``resolution_2d`` -> image_size; sphere/cylinder radius from the train
    sampler transform; ``train_pixel_credit`` (an n-image budget at
    resolution_2d) -> image_slots; ``sample_per_epoch``; dataset kind from
    ``class``."""
    with open(path) as f:
        doc = yaml.safe_load(f)
    env = dict(doc)

    def interp(v):
        # minimal ${data.x} interpolation
        while isinstance(v, str) and v.startswith("${data."):
            v = env.get(v[len("${data."):-1], v)
            if isinstance(v, str) and not v.startswith("${data."):
                break
        return v

    out: Dict = {}
    cls = doc.get("class", "")
    out["dataset"] = ("s3dis" if "s3dis" in cls.lower() else
                      "scannet" if "scannet" in cls.lower() else
                      "kitti360" if "kitti" in cls.lower() else cls)
    vox = interp(doc.get("first_subsampling", doc.get("resolution_3d", 0.05)))
    out["voxel_size"] = float(vox)
    res2d = interp(doc.get("resolution_2d", [1024, 512]))
    out["image_size"] = [int(x) for x in res2d]
    if "sample_per_epoch" in doc:
        out["samples_per_epoch"] = int(doc["sample_per_epoch"])
    mm = doc.get("multimodal", {})
    settings = mm.get("settings", {})
    if "train_pixel_credit" in settings:
        out["image_slots"] = int(settings["train_pixel_credit"])
    # sphere / cylinder radius from the train sampling transform
    for t in doc.get("train_transforms", []) or []:
        if t.get("transform") in ("RandomSphere", "RandomCylinder"):
            r = interp(t.get("params", {}).get("radius", 2.0))
            out["radius"] = float(r)
    out.setdefault("radius", 2.0)
    return out
