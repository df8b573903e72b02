"""Convert torch ResNet-18 checkpoints to our flax tower parameters.

The reference consumes pretrained 2D towers (torchvision ImageNet ResNet18,
MIT-semseg ADE20K ResNet18-dilated8 + PPM, Cityscapes) —
modules/multimodal/modalities/image.py:721-1398.  This converter maps a
torch ``state_dict`` (loaded with the baked-in CPU torch; the .pth files
must be provided locally — zero-egress environment) onto the parameter tree
of :class:`deepviewagg_tpu.modules.image_encoders.ResNet18` with
``norm='batch'``.

Name mapping (torchvision ResNet):
  conv1/bn1                  -> Conv2dWS_0 / _Norm_0(BatchNorm_0)
  layer{i}.{j}.conv{k}/bn{k} -> _BasicBlock2d_{2(i-1)+j}.Conv2dWS_{k-1}/...
  layer{i}.{j}.downsample    -> the block's third conv/norm pair

Weight layout: torch conv [O, I, kh, kw] -> flax HWIO [kh, kw, I, O].
"""

from __future__ import annotations

from typing import Dict

import numpy as np

__all__ = ["convert_resnet18", "convert_ppm_head",
           "load_torch_state_dict", "strip_prefix"]


def strip_prefix(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    """Drop a wrapper prefix (``module.`` from DataParallel saves,
    ``encoder.``/``backbone.`` from segmentation checkpoints) so the
    torchvision-style converters below see bare keys."""
    out = {}
    for k, v in sd.items():
        out[k[len(prefix):] if k.startswith(prefix) else k] = v
    return out


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    out = {}
    for k, v in sd.items():
        k = k.replace("module.", "")
        out[k] = v.detach().cpu().numpy()
    return out


def _conv(w):
    # torch OIHW -> our conv's spatial layout: framework arrays are
    # [N, W, H, C] (x = image width first), so torch's (kh, kw) swap to
    # (kw, kh): OIHW -> WHIO
    return np.transpose(w, (3, 2, 1, 0))


def _bn(sd, prefix):
    return (
        {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]},
        {"mean": sd[f"{prefix}.running_mean"],
         "var": sd[f"{prefix}.running_var"]},
    )


def convert_resnet18(sd: Dict[str, np.ndarray], out_level: int = 4):
    """-> ``(params, batch_stats)`` pytrees for ``ResNet18(norm='batch',
    out_level=out_level)``.  Tolerates truncated checkpoints (missing layers
    are skipped; init the model first and merge).  Detects the MIT-semseg
    deep stem (``conv3.weight`` present — three 3x3 convs; build the model
    with ``deep_stem=True``) vs torchvision's single 7x7 ``conv1``."""
    params: Dict = {}
    stats: Dict = {}

    def put(tree, path, leaf):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = leaf

    n_stem = 3 if "conv3.weight" in sd else 1
    for i in range(n_stem):
        put(params, (f"Conv2dWS_{i}", "kernel"), _conv(sd[f"conv{i+1}.weight"]))
        bn_p, bn_s = _bn(sd, f"bn{i+1}")
        put(params, (f"_Norm_{i}", "BatchNorm_0", "scale"), bn_p["scale"])
        put(params, (f"_Norm_{i}", "BatchNorm_0", "bias"), bn_p["bias"])
        put(stats, (f"_Norm_{i}", "BatchNorm_0", "mean"), bn_s["mean"])
        put(stats, (f"_Norm_{i}", "BatchNorm_0", "var"), bn_s["var"])

    block_idx = 0
    for layer in range(1, out_level + 1):
        for j in range(2):
            tp = f"layer{layer}.{j}"
            if f"{tp}.conv1.weight" not in sd:
                continue
            bp = f"_BasicBlock2d_{block_idx}"
            block_idx += 1
            for k in (1, 2):
                put(params, (bp, f"Conv2dWS_{k-1}", "kernel"),
                    _conv(sd[f"{tp}.conv{k}.weight"]))
                bn_p, bn_s = _bn(sd, f"{tp}.bn{k}")
                put(params, (bp, f"_Norm_{k-1}", "BatchNorm_0", "scale"),
                    bn_p["scale"])
                put(params, (bp, f"_Norm_{k-1}", "BatchNorm_0", "bias"),
                    bn_p["bias"])
                put(stats, (bp, f"_Norm_{k-1}", "BatchNorm_0", "mean"),
                    bn_s["mean"])
                put(stats, (bp, f"_Norm_{k-1}", "BatchNorm_0", "var"),
                    bn_s["var"])
            if f"{tp}.downsample.0.weight" in sd:
                put(params, (bp, "Conv2dWS_2", "kernel"),
                    _conv(sd[f"{tp}.downsample.0.weight"]))
                bn_p, bn_s = _bn(sd, f"{tp}.downsample.1")
                put(params, (bp, "_Norm_2", "BatchNorm_0", "scale"),
                    bn_p["scale"])
                put(params, (bp, "_Norm_2", "BatchNorm_0", "bias"),
                    bn_p["bias"])
                put(stats, (bp, "_Norm_2", "BatchNorm_0", "mean"),
                    bn_s["mean"])
                put(stats, (bp, "_Norm_2", "BatchNorm_0", "var"),
                    bn_s["var"])
    return params, stats


def convert_ppm_head(sd: Dict[str, np.ndarray], prefix: str = "",
                     bins: int = 4):
    """-> ``(params, batch_stats)`` for ``PPM(out_channels=512,
    norm='batch')`` from an MIT-semseg ``PPMDeepsup`` decoder state dict
    (the reference strips dropout + classifier and keeps ``ppm.{i}`` scale
    convs plus ``conv_last`` — modalities/image.py:659-720; keys
    ``ppm.{i}.1/2`` are the 1x1 conv + BN inside each Sequential,
    ``conv_last.0/1`` the fused 3x3 conv + BN)."""
    params: Dict = {}
    stats: Dict = {}

    def put(tree, path, leaf):
        node = tree
        for q in path[:-1]:
            node = node.setdefault(q, {})
        node[path[-1]] = leaf

    for i in range(bins):
        conv_key = f"{prefix}ppm.{i}.1.weight"
        if conv_key not in sd:
            continue
        put(params, (f"Conv2dWS_{i}", "kernel"), _conv(sd[conv_key]))
        bn_p, bn_s = _bn(sd, f"{prefix}ppm.{i}.2")
        put(params, (f"_Norm_{i}", "BatchNorm_0", "scale"), bn_p["scale"])
        put(params, (f"_Norm_{i}", "BatchNorm_0", "bias"), bn_p["bias"])
        put(stats, (f"_Norm_{i}", "BatchNorm_0", "mean"), bn_s["mean"])
        put(stats, (f"_Norm_{i}", "BatchNorm_0", "var"), bn_s["var"])
    if f"{prefix}conv_last.0.weight" in sd:
        put(params, (f"Conv2dWS_{bins}", "kernel"),
            _conv(sd[f"{prefix}conv_last.0.weight"]))
        bn_p, bn_s = _bn(sd, f"{prefix}conv_last.1")
        put(params, (f"_Norm_{bins}", "BatchNorm_0", "scale"), bn_p["scale"])
        put(params, (f"_Norm_{bins}", "BatchNorm_0", "bias"), bn_p["bias"])
        put(stats, (f"_Norm_{bins}", "BatchNorm_0", "mean"), bn_s["mean"])
        put(stats, (f"_Norm_{bins}", "BatchNorm_0", "var"), bn_s["var"])
    return params, stats


def merge_tower_params(variables, tower_path, converted_params,
                       converted_stats):
    """Overlay converted weights onto an initialized variable tree at
    ``tower_path`` (e.g. ('branch_l0', 'tower', 'ResNet18_0')); returns new
    variables.  Shapes are checked leaf by leaf."""
    import jax

    def overlay(dst, src, path=()):
        out = dict(dst)
        for k, v in src.items():
            if isinstance(v, dict):
                out[k] = overlay(dst.get(k, {}), v, path + (k,))
            else:
                if k in dst and np.shape(dst[k]) != np.shape(v):
                    raise ValueError(
                        f"shape mismatch at {'/'.join(path + (k,))}: "
                        f"{np.shape(dst[k])} vs {np.shape(v)}"
                    )
                out[k] = np.asarray(v)
        return out

    variables = jax.tree_util.tree_map(lambda x: x, variables)  # copy
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    node_p = params
    node_s = stats
    for p in tower_path[:-1]:
        node_p = node_p[p]
        node_s = node_s.get(p, {}) if isinstance(node_s, dict) else {}
    leaf = tower_path[-1]
    node_p[leaf] = overlay(node_p.get(leaf, {}), converted_params)
    if isinstance(node_s, dict) and node_s is not None:
        node_s[leaf] = overlay(node_s.get(leaf, {}), converted_stats)
    return variables
