"""Load the reference's pure-torch modules for numerical parity tests.

The reference imports ``torch_scatter`` (a CUDA extension absent here); the
segment ops it actually uses are small enough to shim exactly in ~50 lines of
plain torch (semantics per torch_scatter: CSR segment reductions, empty
segments reduce to 0, scatter_min/max return (values, argindices) with
``src.size(dim)`` as the empty-slot sentinel).  With the shim registered, the
reference files ``modules/multimodal/pooling.py`` and ``fusion.py`` are
executed from /root/reference verbatim — no reference code is copied into
this repo — giving us the actual PyTorch modules to transplant weights into
and compare against (VERDICT r2 item #1).

NOTE: this module ships shims written from torch_scatter's documented
behavior, not torch_scatter code.
"""

from __future__ import annotations

import importlib.util
import sys
import types

import torch

REFERENCE_ROOT = "/root/reference"


# ---------------------------------------------------------------- shims ----
def _seg_ids(indptr: torch.Tensor) -> torch.Tensor:
    sizes = indptr[1:] - indptr[:-1]
    return torch.repeat_interleave(torch.arange(sizes.numel()), sizes)


def segment_csr(src, indptr, out=None, reduce="sum"):
    assert out is None
    indptr = indptr.long()
    sizes = indptr[1:] - indptr[:-1]
    n = sizes.numel()
    seg = _seg_ids(indptr)
    shape = (n,) + tuple(src.shape[1:])
    res = torch.zeros(shape, dtype=src.dtype)
    if reduce in ("sum", "add", "mean"):
        res.index_add_(0, seg, src)
        if reduce == "mean":
            denom = sizes.clamp(min=1).to(src.dtype)
            res = res / denom.reshape((-1,) + (1,) * (src.dim() - 1))
    elif reduce in ("min", "max"):
        # include_self=False: rows with no sources keep the 0 init — the
        # torch_scatter empty-segment convention
        res.index_reduce_(0, seg, src, "amax" if reduce == "max" else "amin",
                          include_self=False)
    else:
        raise ValueError(reduce)
    return res


def _scatter_extremum(src, index, dim, dim_size, mode):
    assert dim in (0, -src.dim()), "shim supports dim=0 only"
    n = int(dim_size) if dim_size is not None else int(index.max()) + 1
    shape = (n,) + tuple(src.shape[1:])
    vals = torch.zeros(shape, dtype=src.dtype)
    vals.index_reduce_(0, index, src, mode, include_self=False)
    # arg = first src row attaining the extremum; sentinel src.size(0) when
    # the slot received nothing
    pos = torch.arange(src.shape[0])
    if src.dim() > 1:
        pos = pos.reshape((-1,) + (1,) * (src.dim() - 1)).expand_as(src)
    hit = src == vals.index_select(0, index)
    cand = torch.where(hit, pos, torch.full_like(pos, src.shape[0]))
    args = torch.full(shape, src.shape[0], dtype=torch.long)
    args.index_reduce_(0, index, cand.long(), "amin", include_self=False)
    counts = torch.zeros(n, dtype=torch.long)
    counts.index_add_(0, index, torch.ones_like(index))
    empty = counts == 0
    if empty.any():
        args[empty] = src.shape[0]
        vals[empty] = 0
    return vals, args


def scatter_max(src, index, dim=-1, out=None, dim_size=None):
    assert out is None
    return _scatter_extremum(src, index, dim, dim_size, "amax")


def scatter_min(src, index, dim=-1, out=None, dim_size=None):
    assert out is None
    return _scatter_extremum(src, index, dim, dim_size, "amin")


def scatter_mean(src, index, dim=-1, out=None, dim_size=None):
    assert out is None
    assert dim in (0, -src.dim()), "shim supports dim=0 only"
    n = int(dim_size) if dim_size is not None else int(index.max()) + 1
    res = torch.zeros((n,) + tuple(src.shape[1:]), dtype=src.dtype)
    res.index_add_(0, index, src)
    counts = torch.zeros(n, dtype=src.dtype)
    counts.index_add_(0, index, torch.ones(index.shape[0], dtype=src.dtype))
    return res / counts.clamp(min=1).reshape((-1,) + (1,) * (src.dim() - 1))


def scatter_add(src, index, dim=-1, out=None, dim_size=None):
    assert out is None
    assert dim in (0, -src.dim()), "shim supports dim=0 only"
    n = int(dim_size) if dim_size is not None else int(index.max()) + 1
    res = torch.zeros((n,) + tuple(src.shape[1:]), dtype=src.dtype)
    res.index_add_(0, index, src)
    return res


def scatter(src, index, dim=-1, out=None, dim_size=None, reduce="sum"):
    """Generic dispatcher (torch_scatter.scatter documented semantics);
    the reference uses it for x_seen merging (modules.py:225)."""
    if reduce in ("sum", "add"):
        if src.dtype == torch.bool:    # logical-or merge of seen masks
            return scatter_add(src.long(), index, dim, out, dim_size) > 0
        return scatter_add(src, index, dim, out, dim_size)
    if reduce == "mean":
        return scatter_mean(src, index, dim, out, dim_size)
    if reduce == "max":
        return scatter_max(src, index, dim, out, dim_size)[0]
    if reduce == "min":
        return scatter_min(src, index, dim, out, dim_size)[0]
    raise ValueError(reduce)


def _torch_scatter_module() -> types.ModuleType:
    mod = types.ModuleType("torch_scatter")
    mod.segment_csr = segment_csr
    mod.scatter_max = scatter_max
    mod.scatter_min = scatter_min
    mod.scatter_mean = scatter_mean
    mod.scatter_add = scatter_add
    mod.scatter = scatter
    return mod


# ------------------------------------------------------ torchsparse shim ----
def sphash(coords):
    """Injective int64 key for (N, 4) integer coordinates (torchsparse's
    documented sphash contract: equal coords <-> equal keys, comparable
    across calls).  Assumes |coord| < 2**14 — ample for test voxel grids."""
    c = coords.long() + (1 << 14)
    assert (c >= 0).all() and (c < (1 << 15)).all(), "coords out of shim range"
    B = 1 << 15
    return ((c[:, 0] * B + c[:, 1]) * B + c[:, 2]) * B + c[:, 3]


def sphashquery(queries, references):
    """Index of each query key in the reference keys, -1 when absent."""
    lookup = {int(k): i for i, k in enumerate(references.tolist())}
    return torch.tensor([lookup.get(int(k), -1) for k in queries.tolist()],
                        dtype=torch.long)


class FakeSparseTensor:
    """Minimal stand-in exposing what forward_3d_block_down reads from a
    torchsparse SparseTensor: features F, coords C (batch in LAST column),
    stride s, and the per-stride coord_maps dict (modules.py:167-212)."""

    def __init__(self, F, C, s=1, coord_maps=None):
        self.F = F
        self.C = C
        self.s = s
        self.coord_maps = coord_maps if coord_maps is not None else {s: C}


class MockStridedVoxelConv(torch.nn.Module):
    """Pure-torch stride-2 'sparse conv' for composed strided parity tests:
    linear -> ReLU -> per-output-voxel mean pooling.

    Mimics what ``forward_3d_block_down`` (modules.py:166-212) needs from a
    strided torchsparse conv: output coords are the unique input coords
    voxelized to the doubled stride (torchsparse convention — coords stay in
    level-0 units, batch index in the LAST column) and ``coord_maps`` gains
    the new stride level, so the reference's own sphash/sphashquery reindex
    recovery runs on it verbatim.  Output rows come out in ascending
    (batch, x, y, z) order — the same canonical order as this repo's
    ``ops.voxel.unique_coords``, so rows align 1:1 across implementations.
    Coordinates must be non-negative and < 2**14 (the sphash shim range).
    """

    def __init__(self, c_in, c_out):
        super().__init__()
        self.lin = torch.nn.Linear(c_in, c_out)

    def forward(self, st):
        s_out = st.s * 2
        C = st.C.clone().long()
        C[:, :3] = torch.div(C[:, :3], s_out, rounding_mode="floor") * s_out
        # pack as (batch, x, y, z) — batch lives in the LAST coord column
        B = 1 << 15
        key = ((C[:, 3] * B + C[:, 0]) * B + C[:, 1]) * B + C[:, 2]
        uniq, inv = torch.unique(key, return_inverse=True)  # sorted asc
        out_c = torch.empty((len(uniq), 4), dtype=st.C.dtype)
        out_c[inv] = C.to(st.C.dtype)  # rows within a group are identical
        f = torch.relu(self.lin(st.F))
        out_f = torch.zeros((len(uniq), f.shape[1]), dtype=f.dtype)
        out_f.index_add_(0, inv, f)
        counts = torch.zeros(len(uniq), dtype=f.dtype)
        counts.index_add_(0, inv, torch.ones(len(inv), dtype=f.dtype))
        out_f = out_f / counts[:, None]
        cmaps = dict(st.coord_maps)
        cmaps[s_out] = out_c
        return FakeSparseTensor(out_f, out_c, s=s_out, coord_maps=cmaps)


def _torchsparse_modules() -> dict:
    ts = types.ModuleType("torchsparse")
    ts_nn = types.ModuleType("torchsparse.nn")
    ts_f = types.ModuleType("torchsparse.nn.functional")
    ts_f.sphash = sphash
    ts_f.sphashquery = sphashquery
    ts.SparseTensor = FakeSparseTensor
    ts.nn = ts_nn
    ts_nn.functional = ts_f
    return {"torchsparse": ts, "torchsparse.nn": ts_nn,
            "torchsparse.nn.functional": ts_f}


def _numba_module() -> types.ModuleType:
    """Passthrough ``numba`` shim: the reference's ``@njit`` CPU kernels are
    pure numpy, so running them un-jitted (slow but exact) gives the actual
    reference semantics without the numba dependency."""
    mod = types.ModuleType("numba")

    def njit(fn=None, **_kwargs):
        if callable(fn):
            return fn
        return lambda f: f

    mod.njit = njit
    mod.jit = njit
    return mod


class _LazyTensor:
    """Dense shim for the two-operand pykeops pattern the reference uses
    (visibility.py:1440-1443): ``((LazyTensor(q[:, None, :]) -
    LazyTensor(s[None, :, :])) ** 2).sum(dim=2).argKmin(k, dim=1)``.
    Implemented densely in plain torch from the documented keops semantics
    (exact brute-force kNN)."""

    def __init__(self, t):
        self.t = t

    def __sub__(self, other):
        return _LazyTensor(self.t - other.t)

    def __pow__(self, p):
        return _LazyTensor(self.t ** p)

    def sum(self, dim=-1):
        return _LazyTensor(self.t.sum(dim=dim))

    def argKmin(self, k, dim=1):
        return self.t.topk(k, dim=dim, largest=False).indices


def _pykeops_module() -> types.ModuleType:
    mod = types.ModuleType("pykeops")
    sub = types.ModuleType("pykeops.torch")
    sub.LazyTensor = _LazyTensor
    mod.torch = sub
    return mod


# --------------------------------------------------------------- loader ----
def load_reference_module(relpath: str, name: str):
    """Execute a reference source file under ``name`` without importing its
    parent packages' __init__ chain (which pulls CUDA deps)."""
    if name in sys.modules:
        return sys.modules[name]
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    if "torch_scatter" not in sys.modules:
        sys.modules["torch_scatter"] = _torch_scatter_module()
    if "numba" not in sys.modules:
        sys.modules["numba"] = _numba_module()
    if "pykeops" not in sys.modules:
        pk = _pykeops_module()
        sys.modules["pykeops"] = pk
        sys.modules["pykeops.torch"] = pk.torch
    spec = importlib.util.spec_from_file_location(
        name, f"{REFERENCE_ROOT}/{relpath}"
    )
    module = importlib.util.module_from_spec(spec)
    orig_script = torch.jit.script
    torch.jit.script = lambda fn=None, *a, **k: fn  # identity decorator
    try:
        sys.modules[name] = module
        spec.loader.exec_module(module)
    finally:
        torch.jit.script = orig_script
    return module


def load_reference_pooling():
    return load_reference_module(
        "torch_points3d/modules/multimodal/pooling.py", "ref_mm_pooling"
    )


def load_reference_fusion():
    return load_reference_module(
        "torch_points3d/modules/multimodal/fusion.py", "ref_mm_fusion"
    )


def load_reference_visibility():
    """The reference's full visibility/projection module, running its
    un-jitted numba CPU kernels (exact numpy semantics)."""
    return load_reference_module(
        "torch_points3d/core/multimodal/visibility.py", "ref_mm_visibility"
    )


def _stub_package(name: str) -> None:
    if name not in sys.modules:
        mod = types.ModuleType(name)
        # real __path__ so OTHER submodules (e.g. core.common_modules, which
        # pooling.py imports and whose deps are only torch/numpy) still
        # resolve through the normal finder; the stub only skips THIS
        # package's __init__ side effects
        mod.__path__ = [f"{REFERENCE_ROOT}/{name.replace('.', '/')}"]
        sys.modules[name] = mod


def load_reference_image():
    """The reference's CSR container + image holder + ImageMapping module
    (core/multimodal/{csr,image}.py), loaded under their real dotted names
    with stub parent packages so the heavy torch_points3d ``__init__`` chain
    (torch_geometric, hydra, ...) never executes."""
    if "torch_points3d.core.multimodal.image" in sys.modules:
        return sys.modules["torch_points3d.core.multimodal.image"]
    for p in ("torch_points3d", "torch_points3d.core",
              "torch_points3d.core.multimodal", "torch_points3d.utils"):
        _stub_package(p)
    load_reference_module(
        "torch_points3d/utils/multimodal.py", "torch_points3d.utils.multimodal"
    )
    csr = load_reference_module(
        "torch_points3d/core/multimodal/csr.py",
        "torch_points3d.core.multimodal.csr",
    )
    pkg = sys.modules["torch_points3d.core.multimodal"]
    pkg.CSRData, pkg.CSRBatch = csr.CSRData, csr.CSRBatch
    load_reference_module(
        "torch_points3d/core/multimodal/visibility.py",
        "torch_points3d.core.multimodal.visibility",
    )
    return load_reference_module(
        "torch_points3d/core/multimodal/image.py",
        "torch_points3d.core.multimodal.image",
    )


def load_reference_mm_modules():
    """The reference's composed multimodal blocks — ``MultimodalBlockDown``
    and ``UnimodalBranch`` (modules/multimodal/modules.py:23,249) — executed
    verbatim with shims for torchsparse sphash/sphashquery and the
    MODALITY_NAMES constant (core/multimodal/data.py:9-10; the real data.py
    needs torch_geometric, absent here; the constant is ["image"])."""
    name = "torch_points3d.modules.multimodal.modules"
    if name in sys.modules:
        return sys.modules[name]
    for p in ("torch_points3d", "torch_points3d.core",
              "torch_points3d.core.multimodal", "torch_points3d.modules",
              "torch_points3d.modules.multimodal"):
        _stub_package(p)
    if "torch_points3d.core.multimodal.data" not in sys.modules:
        data_mod = types.ModuleType("torch_points3d.core.multimodal.data")
        data_mod.MODALITY_NAMES = ["image"]
        sys.modules["torch_points3d.core.multimodal.data"] = data_mod
    for n, mod in _torchsparse_modules().items():
        sys.modules.setdefault(n, mod)
    return load_reference_module(
        "torch_points3d/modules/multimodal/modules.py", name)


# ---------------------------------------------------- weight transplants ----
def t2j(t):
    import jax.numpy as jnp

    return jnp.asarray(t.detach().cpu().numpy())


def copy_torch_mlp(sd: dict, prefix: str, tree: dict, stats: dict,
                   n_layers: int = 2) -> None:
    """torch_points3d MLP (Seq of [Linear, FastBatchNorm1d, act]) -> this
    repo's flax MLP (Dense_i + MaskedBatchNorm_i)."""
    for i in range(n_layers):
        lin = f"{prefix}.{i}.0"
        bn = f"{prefix}.{i}.1.batch_norm"
        tree[f"Dense_{i}"]["kernel"] = t2j(sd[f"{lin}.weight"]).T
        if f"{lin}.bias" in sd:
            tree[f"Dense_{i}"]["bias"] = t2j(sd[f"{lin}.bias"])
        tree[f"MaskedBatchNorm_{i}"]["scale"] = t2j(sd[f"{bn}.weight"])
        tree[f"MaskedBatchNorm_{i}"]["bias"] = t2j(sd[f"{bn}.bias"])
        stats[f"MaskedBatchNorm_{i}"]["mean"] = t2j(sd[f"{bn}.running_mean"])
        stats[f"MaskedBatchNorm_{i}"]["var"] = t2j(sd[f"{bn}.running_var"])


def copy_deepset(sd: dict, prefix: str, tree: dict, stats: dict) -> None:
    for part in ("mlp_elt_1", "mlp_set", "mlp_elt_2"):
        copy_torch_mlp(sd, f"{prefix}.{part}", tree[part], stats[part])


def randomize_torch_module(module, seed: int = 0) -> None:
    """Replace every parameter AND BN running stat with random values so the
    transplant comparison exercises non-default weights."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.3)
        for name, buf in module.named_buffers():
            if name.endswith("running_mean"):
                buf.copy_(torch.randn(buf.shape, generator=g) * 0.1)
            elif name.endswith("running_var"):
                buf.copy_(torch.rand(buf.shape, generator=g) + 0.5)


def load_reference_function(relpath: str, func_name: str, extra_globals=None):
    """Exec a single top-level function from a reference source file (via
    AST) without importing the file's heavy module-level dependencies."""
    import ast

    path = f"{REFERENCE_ROOT}/{relpath}"
    with open(path) as f:
        tree = ast.parse(f.read())
    nodes = [n for n in tree.body
             if isinstance(n, ast.FunctionDef) and n.name == func_name]
    assert nodes, f"{func_name} not found in {relpath}"
    ns = {"torch": torch}
    ns.update(extra_globals or {})
    exec(compile(ast.Module(body=nodes, type_ignores=[]), path, "exec"), ns)
    return ns[func_name]


def load_reference_grid_transform():
    """The reference's grid_transform module (GridSampling3D + group_data),
    with faithful minimal shims for the torch_geometric/torch_cluster
    clustering primitives (grid_cluster on unit-size rounded coords ==
    group-identical-rows; consecutive_cluster == unique inverse + first
    occurrence)."""
    if "ref_grid_transform" in sys.modules:
        return sys.modules["ref_grid_transform"]

    def grid_cluster(coords, size):
        return torch.unique(coords, dim=0, return_inverse=True)[1]

    def voxel_grid(coords, batch, size):
        both = torch.cat([batch.view(-1, 1).to(coords.dtype), coords], dim=1)
        return torch.unique(both, dim=0, return_inverse=True)[1]

    def consecutive_cluster(src):
        unique, inv = torch.unique(src, sorted=True, return_inverse=True)
        perm = torch.arange(inv.size(0))
        first = torch.full((unique.numel(),), -1, dtype=torch.long)
        # first occurrence per cluster (scatter keeps last write; reverse)
        first[inv.flip(0)] = perm.flip(0)
        return inv, first

    class Data(dict):
        def __init__(self, **kw):
            super().__init__(**kw)
            self.__dict__ = self

        @property
        def num_nodes(self):
            return self["pos"].shape[0]

        @property
        def keys(self):
            return list(super().keys())

        def __iter__(self):
            return iter(list(super().items()))

    tg = types.ModuleType("torch_geometric")
    tg_nn = types.ModuleType("torch_geometric.nn")
    tg_nn.voxel_grid = voxel_grid
    tg_pool = types.ModuleType("torch_geometric.nn.pool")
    tg_cons = types.ModuleType("torch_geometric.nn.pool.consecutive")
    tg_cons.consecutive_cluster = consecutive_cluster
    tg_data = types.ModuleType("torch_geometric.data")
    tg_data.Data = Data
    tc = types.ModuleType("torch_cluster")
    tc.grid_cluster = grid_cluster
    for name, mod in [("torch_geometric", tg), ("torch_geometric.nn", tg_nn),
                      ("torch_geometric.nn.pool", tg_pool),
                      ("torch_geometric.nn.pool.consecutive", tg_cons),
                      ("torch_geometric.data", tg_data),
                      ("torch_cluster", tc)]:
        sys.modules.setdefault(name, mod)
        # earlier loaders may have registered a stub package with the same
        # dotted name but without our attributes — fill them in
        for attr in vars(mod):
            if not attr.startswith("_"):
                setattr(sys.modules[name], attr, getattr(mod, attr))
    for p in ("torch_points3d", "torch_points3d.utils",
              "torch_points3d.core", "torch_points3d.core.data_transform"):
        _stub_package(p)
    load_reference_module(
        "torch_points3d/utils/multimodal.py", "torch_points3d.utils.multimodal"
    )
    mod = load_reference_module(
        "torch_points3d/core/data_transform/grid_transform.py",
        "ref_grid_transform",
    )
    mod.Data = Data
    return mod


# ------------------------ torchvision / mit_semseg functional shims --------
def _install_torchvision_shim():
    """A faithful ``torchvision.models.resnet`` — ``ResNet``/``BasicBlock``
    reimplemented from the public topology — so the reference's torchvision
    truncation classes (image.py:959-1131) execute verbatim with transplant-
    able weights.  ``load_state_dict_from_url`` raises (zero egress here);
    parity tests run ``pretrained=False`` or save a local ``.pth``."""
    import torch.nn as tnn

    tv = sys.modules.get("torchvision")
    if tv is not None and hasattr(getattr(tv, "models", None), "resnet") \
            and hasattr(tv.models.resnet, "ResNet"):
        return

    def conv3x3(cin, cout, stride=1, dilation=1):
        return tnn.Conv2d(cin, cout, 3, stride=stride, padding=dilation,
                          dilation=dilation, bias=False)

    class BasicBlock(tnn.Module):
        expansion = 1

        def __init__(self, inplanes, planes, stride=1, downsample=None,
                     norm_layer=tnn.BatchNorm2d):
            super().__init__()
            self.conv1 = conv3x3(inplanes, planes, stride)
            self.bn1 = norm_layer(planes)
            self.relu = tnn.ReLU(inplace=True)
            self.conv2 = conv3x3(planes, planes)
            self.bn2 = norm_layer(planes)
            self.downsample = downsample
            self.stride = stride

        def forward(self, x):
            identity = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            if self.downsample is not None:
                identity = self.downsample(x)
            return self.relu(out + identity)

    def make_layer(owner, block, planes, blocks, stride=1,
                   norm_layer=tnn.BatchNorm2d):
        downsample = None
        if stride != 1 or owner.inplanes != planes * block.expansion:
            downsample = tnn.Sequential(
                tnn.Conv2d(owner.inplanes, planes * block.expansion, 1,
                           stride=stride, bias=False),
                norm_layer(planes * block.expansion))
        layers = [block(owner.inplanes, planes, stride, downsample,
                        norm_layer)]
        owner.inplanes = planes * block.expansion
        layers += [block(owner.inplanes, planes, norm_layer=norm_layer)
                   for _ in range(1, blocks)]
        return tnn.Sequential(*layers)

    class ResNet(tnn.Module):
        """torchvision single-7x7-stem ResNet."""

        def __init__(self, block, layers, num_classes=1000):
            super().__init__()
            self.inplanes = 64
            self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3,
                                    bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.relu = tnn.ReLU(inplace=True)
            self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
            self.layer1 = make_layer(self, block, 64, layers[0])
            self.layer2 = make_layer(self, block, 128, layers[1], stride=2)
            self.layer3 = make_layer(self, block, 256, layers[2], stride=2)
            self.layer4 = make_layer(self, block, 512, layers[3], stride=2)
            self.avgpool = tnn.AdaptiveAvgPool2d((1, 1))
            self.fc = tnn.Linear(512 * block.expansion, num_classes)

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            for layer in (self.layer1, self.layer2, self.layer3,
                          self.layer4):
                x = layer(x)
            return self.fc(torch.flatten(self.avgpool(x), 1))

    def load_state_dict_from_url(url, *a, **k):
        raise RuntimeError(f"no network egress in this environment: {url}")

    tv = sys.modules.get("torchvision") or types.ModuleType("torchvision")
    models = getattr(tv, "models", None)
    if not isinstance(models, types.ModuleType):
        models = types.ModuleType("torchvision.models")
        tv.models = models
    resnet = types.ModuleType("torchvision.models.resnet")
    resnet.ResNet, resnet.BasicBlock = ResNet, BasicBlock
    resnet.conv3x3 = conv3x3
    resnet._make_layer = make_layer
    resnet.model_urls = {
        f"resnet{n}": f"https://download.pytorch.org/models/resnet{n}.pth"
        for n in (18, 34, 50, 101, 152)}
    utils = types.ModuleType("torchvision.models.utils")
    utils.load_state_dict_from_url = load_state_dict_from_url
    models.resnet, models.utils = resnet, utils
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = models
    sys.modules["torchvision.models.resnet"] = resnet
    sys.modules["torchvision.models.utils"] = utils


def _install_mit_semseg_shim():
    """A faithful functional ``mit_semseg`` (CSAILVision semantic-segmentation
    toolkit) shim: the deep-stem dilated ResNet18 encoder and PPM-deepsup
    decoder that the reference's ADE20K tower classes build
    (image.py:721-857), reimplemented from the public topology.

      * ``SynchronizedBatchNorm2d`` == ``nn.BatchNorm2d`` (their single-
        process semantics are identical; sync only changes multi-GPU stats);
      * ``ModelBuilder.build_encoder('resnet18dilated')`` — MIT's deep stem
        (three 3x3 conv-bn-relu: 64, 64, 128) + BasicBlock layers [2,2,2,2]
        with ``_nostride_dilate`` applied to layer3 (d=2) / layer4 (d=4) and
        ``forward(..., return_feature_maps=True)`` returning all four stage
        maps; attributes (conv1..maxpool, layer1-4) exposed for the
        reference's layer0 re-grouping (image.py:833-846);
      * ``ModelBuilder.build_decoder('ppm_deepsup')`` — PPM over scales
        (1,2,3,6): AdaptiveAvgPool -> 1x1 conv(512, no bias) -> BN -> ReLU,
        plus conv_last [3x3 conv(512) -> BN -> ReLU -> Dropout2d ->
        classifier]; ``PPMFeatMap.from_pretrained`` strips the last two
        (image.py:685-700);
      * ``cfg`` — a minimal yacs-style config with ``merge_from_file``.

    Checkpoint loading goes through plain ``torch.load`` +
    ``load_state_dict``, so parity tests can save a randomly-initialized
    state dict under the expected paths and exercise the reference's full
    pretrained-build path."""
    import torch.nn as tnn

    ms = sys.modules.get("mit_semseg")
    if ms is not None and hasattr(
            getattr(getattr(ms, "models", None), "ModelBuilder", None),
            "build_encoder"):
        return

    class SynchronizedBatchNorm2d(tnn.BatchNorm2d):
        pass

    # reuse the torchvision BasicBlock/_make_layer topology
    _install_torchvision_shim()
    tvr = sys.modules["torchvision.models.resnet"]

    class _MITResNet(tnn.Module):
        """MIT resnet.py deep-stem ResNet (their resnet18)."""

        def __init__(self, layers=(2, 2, 2, 2)):
            super().__init__()
            bn = SynchronizedBatchNorm2d
            self.inplanes = 128
            self.conv1 = tvr.conv3x3(3, 64, stride=2)
            self.bn1 = bn(64)
            self.relu1 = tnn.ReLU(inplace=True)
            self.conv2 = tvr.conv3x3(64, 64)
            self.bn2 = bn(64)
            self.relu2 = tnn.ReLU(inplace=True)
            self.conv3 = tvr.conv3x3(64, 128)
            self.bn3 = bn(128)
            self.relu3 = tnn.ReLU(inplace=True)
            self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
            self.layer1 = tvr._make_layer(
                self, tvr.BasicBlock, 64, layers[0], norm_layer=bn)
            self.layer2 = tvr._make_layer(
                self, tvr.BasicBlock, 128, layers[1], stride=2, norm_layer=bn)
            self.layer3 = tvr._make_layer(
                self, tvr.BasicBlock, 256, layers[2], stride=2, norm_layer=bn)
            self.layer4 = tvr._make_layer(
                self, tvr.BasicBlock, 512, layers[3], stride=2, norm_layer=bn)

        def stem(self, x):
            x = self.relu1(self.bn1(self.conv1(x)))
            x = self.relu2(self.bn2(self.conv2(x)))
            x = self.relu3(self.bn3(self.conv3(x)))
            return self.maxpool(x)

        def forward(self, x, return_feature_maps=False):
            conv_out = []
            x = self.stem(x)
            for layer in (self.layer1, self.layer2, self.layer3,
                          self.layer4):
                x = layer(x)
                conv_out.append(x)
            return conv_out if return_feature_maps else [x]

    def _nostride_dilate(m, dilate):
        # MIT ResnetDilated._nostride_dilate: de-stride stage convs; the
        # de-strided 3x3 runs at d/2, every other 3x3 at d
        if isinstance(m, tnn.Conv2d):
            if m.stride == (2, 2):
                m.stride = (1, 1)
                if m.kernel_size == (3, 3):
                    m.dilation = (dilate // 2, dilate // 2)
                    m.padding = (dilate // 2, dilate // 2)
            elif m.kernel_size == (3, 3):
                m.dilation = (dilate, dilate)
                m.padding = (dilate, dilate)

    def _dilate(net, dilate_scale=8):
        import functools as _ft

        if dilate_scale == 8:
            net.layer3.apply(_ft.partial(_nostride_dilate, dilate=2))
            net.layer4.apply(_ft.partial(_nostride_dilate, dilate=4))
        elif dilate_scale == 16:
            net.layer4.apply(_ft.partial(_nostride_dilate, dilate=2))
        return net

    class _PPMDeepsup(tnn.Module):
        def __init__(self, num_class=150, fc_dim=512, use_softmax=False,
                     pool_scales=(1, 2, 3, 6)):
            super().__init__()
            bn = SynchronizedBatchNorm2d
            self.use_softmax = use_softmax
            self.ppm = tnn.ModuleList([
                tnn.Sequential(
                    tnn.AdaptiveAvgPool2d(s),
                    tnn.Conv2d(fc_dim, 512, 1, bias=False),
                    bn(512),
                    tnn.ReLU(inplace=True))
                for s in pool_scales])
            self.conv_last = tnn.Sequential(
                tnn.Conv2d(fc_dim + len(pool_scales) * 512, 512, 3,
                           padding=1, bias=False),
                bn(512),
                tnn.ReLU(inplace=True),
                tnn.Dropout2d(0.1),
                tnn.Conv2d(512, num_class, 1))

        def forward(self, conv_out, segSize=None):
            import torch.nn.functional as F

            conv5 = conv_out[-1]
            sz = conv5.size()
            out = [conv5] + [
                F.interpolate(p(conv5), (sz[2], sz[3]), mode="bilinear",
                              align_corners=False) for p in self.ppm]
            x = self.conv_last(torch.cat(out, 1))
            if self.use_softmax:
                x = tnn.functional.softmax(x, dim=1)
            return x

    class ModelBuilder:
        @staticmethod
        def build_encoder(arch="resnet18dilated", fc_dim=512, weights=""):
            arch = arch.lower()
            assert arch in ("resnet18", "resnet18dilated"), arch
            net = _MITResNet()
            if arch.endswith("dilated"):
                net = _dilate(net, 8)
            if weights:
                net.load_state_dict(
                    torch.load(weights, map_location="cpu"), strict=False)
            return net

        @staticmethod
        def build_decoder(arch="ppm_deepsup", fc_dim=512, num_class=150,
                          weights="", use_softmax=False):
            assert arch.lower() == "ppm_deepsup", arch
            dec = _PPMDeepsup(num_class, fc_dim, use_softmax)
            if weights:
                dec.load_state_dict(
                    torch.load(weights, map_location="cpu"), strict=False)
            return dec

    class _YacsNS(dict):
        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:
                raise AttributeError(k) from e

        def __setattr__(self, k, v):
            self[k] = v

    cfg = _YacsNS(
        DIR="",
        MODEL=_YacsNS(arch_encoder="resnet18dilated",
                      arch_decoder="ppm_deepsup", fc_dim=512,
                      weights_encoder="", weights_decoder=""),
        TEST=_YacsNS(checkpoint="epoch_20.pth"),
        DATASET=_YacsNS(num_class=150),
    )

    def merge_from_file(path):
        import yaml

        def merge(ns, d):
            for k, v in d.items():
                if isinstance(v, dict):
                    sub = ns.get(k)
                    if not isinstance(sub, _YacsNS):
                        sub = _YacsNS()
                        ns[k] = sub
                    merge(sub, v)
                else:
                    ns[k] = v

        with open(path) as f:
            merge(cfg, yaml.safe_load(f) or {})

    cfg["merge_from_file"] = merge_from_file

    ms = types.ModuleType("mit_semseg")
    ms_cfg = types.ModuleType("mit_semseg.config")
    ms_cfg.cfg = cfg
    ms_models = types.ModuleType("mit_semseg.models")
    ms_models.ModelBuilder = ModelBuilder
    ms_lib = types.ModuleType("mit_semseg.lib")
    ms_lib_nn = types.ModuleType("mit_semseg.lib.nn")
    ms_lib_nn.SynchronizedBatchNorm2d = SynchronizedBatchNorm2d
    ms.config, ms.models, ms.lib = ms_cfg, ms_models, ms_lib
    ms_lib.nn = ms_lib_nn
    for n, m in [("mit_semseg", ms), ("mit_semseg.config", ms_cfg),
                 ("mit_semseg.models", ms_models),
                 ("mit_semseg.lib", ms_lib),
                 ("mit_semseg.lib.nn", ms_lib_nn)]:
        sys.modules[n] = m


def load_reference_image_modality():
    """The reference's scratch 2D stack — ``Conv2dWS``/``ConvTranspose2dWS``/
    ``ReLUWS``/``ResBlock``/``ResNetDown``/``ResNetUp``/``UnaryConv``/``UNet``
    (modules/multimodal/modalities/image.py:39-627) — executed verbatim.

    Stubs (written from documented semantics, nothing copied):
      * ``torchvision`` / ``mit_semseg`` — only the PRETRAINED tower classes
        touch them; the scratch classes under test never do.  The MIT
        ``SynchronizedBatchNorm2d`` stub must be a real nn.Module subclass
        because ``PrudentSynchronizedBatchNorm2d`` inherits from it at class
        definition time (image.py:634).
      * ``torch_points3d.utils.config`` — hydra/omegaconf are absent here;
        the two helpers the scratch stack uses (``is_list``, plain-list
        variant; ``fetch_arguments_from_list`` per its compact-format
        docstring, utils/config.py:78-98) are reimplemented for lists.
    """
    name = "torch_points3d.modules.multimodal.modalities.image"
    if name in sys.modules:
        return sys.modules[name]
    for p in ("torch_points3d", "torch_points3d.core",
              "torch_points3d.modules", "torch_points3d.modules.multimodal",
              "torch_points3d.modules.multimodal.modalities",
              "torch_points3d.utils"):
        _stub_package(p)

    if "torch_points3d.utils.config" not in sys.modules:
        cfg = types.ModuleType("torch_points3d.utils.config")

        def is_list(e):
            return isinstance(e, (list, tuple))

        def fetch_arguments_from_list(opt, index, special_names):
            args = {}
            for o, v in opt.items():
                nm = str(o)
                if is_list(v) and len(v) > 0:
                    if nm[-1] == "s" and nm not in special_names:
                        nm = nm[:-1]
                    v_index = v[index]
                    if is_list(v_index):
                        v_index = list(v_index)
                    try:
                        v_index = eval(v_index)
                    except Exception:
                        pass
                    args[nm] = v_index
                else:
                    if is_list(v):
                        v = list(v)
                    args[nm] = v
            return args

        cfg.is_list = is_list
        cfg.is_iterable = lambda e: isinstance(e, (list, tuple))
        cfg.is_dict = lambda e: isinstance(e, dict)
        cfg.fetch_arguments_from_list = fetch_arguments_from_list
        sys.modules["torch_points3d.utils.config"] = cfg

    _install_torchvision_shim()
    _install_mit_semseg_shim()
    mod = load_reference_module(
        "torch_points3d/modules/multimodal/modalities/image.py", name)

    # torch-version compat (the reference targets torch~1.7 private APIs;
    # semantics unchanged): modern _conv_forward takes bias explicitly, and
    # _output_padding takes num_spatial_dims
    def _conv_forward_compat(self, x, *args, **kwargs):
        w = mod.standardize_weights(self.weight, scaled=self.scaled)
        return self._conv_forward(x, w, self.bias)

    mod.Conv2dWS.forward = _conv_forward_compat

    def _tconv_forward_compat(self, x, *args, output_size=None, **kwargs):
        import torch.nn.functional as F

        output_padding = self._output_padding(
            x, output_size, self.stride, self.padding, self.kernel_size,
            num_spatial_dims=2, dilation=self.dilation)
        w = mod.standardize_weights(self.weight, scaled=self.scaled)
        return F.conv_transpose2d(
            x, w, self.bias, self.stride, self.padding, output_padding,
            self.groups, self.dilation)

    mod.ConvTranspose2dWS.forward = _tconv_forward_compat
    return mod


# ------------------------------------- scratch 2D tower transplants --------
def conv_t2j(t, wh=False):
    """torch Conv2d weight [out, in, kh, kw] -> flax HWIO.  ``wh=True``
    swaps the spatial axes to WHIO for the repo's [N, W, H, C] image
    convention (same swap as utils/torch_convert._conv)."""
    return t2j(t.permute(3, 2, 1, 0) if wh else t.permute(2, 3, 1, 0))


def tconv_t2j(t, wh=False):
    """torch ConvTranspose2d weight [in, out, kh, kw] -> the repo's stored
    forward view [kh, kw, in, out] (WSConvTranspose2d flips at use);
    ``wh=True`` gives [kw, kh, in, out] for [N, W, H, C] inputs."""
    return t2j(t.permute(3, 2, 0, 1) if wh else t.permute(2, 3, 0, 1))


def copy_scratch_resblock(sd, prefix, tree, transpose=False, wh=False):
    """Reference ``ResBlock`` state_dict -> repo ``RefResBlock`` params.
    block Seq layout: 0 conv1 / 1 norm1 / 2 act / 3 conv2 / 4 norm2 / 5 act;
    shortcut: downsample.0 conv + downsample.1 norm (image.py:152-181)."""
    pre = f"{prefix}." if prefix else ""
    cv = tconv_t2j if transpose else conv_t2j
    for i, (c, n) in enumerate([("conv1", "norm1"), ("conv2", "norm2")]):
        tree[c]["kernel"] = cv(sd[f"{pre}block.{3 * i}.weight"], wh)
        tree[c]["bias"] = t2j(sd[f"{pre}block.{3 * i}.bias"])
        _copy_gn(sd, f"{pre}block.{3 * i + 1}", tree[n])
    if f"{pre}downsample.0.weight" in sd:
        tree["down_conv"]["kernel"] = conv_t2j(
            sd[f"{pre}downsample.0.weight"], wh)
        tree["down_conv"]["bias"] = t2j(sd[f"{pre}downsample.0.bias"])
        _copy_gn(sd, f"{pre}downsample.1", tree["down_norm"])


def _copy_gn(sd, prefix, tree):
    tree["GroupNorm_0"]["scale"] = t2j(sd[f"{prefix}.weight"])
    tree["GroupNorm_0"]["bias"] = t2j(sd[f"{prefix}.bias"])


def copy_scratch_stage(sd, prefix, tree, transpose=False, n_blocks=0,
                       wh=False):
    """Reference ``ResNetDown``/``ResNetUp`` -> repo ``ResNetDown2D``/
    ``ResNetUp2D``: conv_in Seq (0 conv / 1 norm / 2 act) + blocks.{j}."""
    pre = f"{prefix}." if prefix else ""
    cv = tconv_t2j if transpose else conv_t2j
    tree["conv_in"]["kernel"] = cv(sd[f"{pre}conv_in.0.weight"], wh)
    tree["conv_in"]["bias"] = t2j(sd[f"{pre}conv_in.0.bias"])
    _copy_gn(sd, f"{pre}conv_in.1", tree["norm_in"])
    for j in range(n_blocks):
        copy_scratch_resblock(sd, f"{pre}blocks.{j}",
                              tree[f"block{j}"], transpose=transpose, wh=wh)


def copy_scratch_unet(sd, tree, down_blocks, up_blocks, has_last=True,
                      down_prefix="down_modules", up_prefix="up_modules",
                      last_prefix="last", wh=False):
    """A reference compact-format UNet tower (down ResNetDowns + up
    ResNetUps + UnaryConv last, image.py:546-572) -> repo ``UNetWS``.
    ``wh=True`` transplants for the repo's [N, W, H, C] image convention
    (in-branch towers); default HWIO suits standalone NHWC parity tests."""
    for i, nb in enumerate(down_blocks):
        copy_scratch_stage(sd, f"{down_prefix}.{i}", tree[f"down{i}"],
                           transpose=False, n_blocks=nb, wh=wh)
    for i, nb in enumerate(up_blocks):
        copy_scratch_stage(sd, f"{up_prefix}.{i}", tree[f"up{i}"],
                           transpose=True, n_blocks=nb, wh=wh)
    if has_last:
        tree["last"]["conv"]["kernel"] = conv_t2j(
            sd[f"{last_prefix}.conv.weight"], wh)
        tree["last"]["conv"]["bias"] = t2j(sd[f"{last_prefix}.conv.bias"])


# ------------------------------------------- preprocessing-chain loader ----
def load_reference_mm_image_transforms():
    """The reference's OFFLINE multimodal preprocessing transforms —
    ``MapImages`` and ``NeighborhoodBasedMappingFeatures``
    (core/data_transform/multimodal/image.py:162-612) — executed verbatim.

    Environment shims (written from documented/observed semantics):
      * ``torch_geometric.data.Data`` — attribute-dict container (the
        handful of behaviors the chain uses: attr get/set/del, ``num_nodes``,
        ``keys``);
      * ``SphereSampling``/``CylinderSampling`` — radius queries over a
        cached sklearn KDTree per transforms.py:301-410 semantics (select
        per-point tensors, optional origin alignment);
      * ``FAISSGPUKNNNeighbourFinder`` — import-only stub (the CPU path
        goes through the dense pykeops ``LazyTensor`` shim instead);
      * ``torchvision.transforms`` / ``GridSampling3D`` /
        ``SaveOriginalPosId`` — import-only stubs, untouched by the two
        transforms under test.
    """
    name = "ref_mm_image_transforms"
    if name in sys.modules:
        return sys.modules[name]

    import numpy as np

    # real CSR/image/visibility modules under their dotted names
    load_reference_image()

    class ShimData(dict):
        """torch_geometric.data.Data stand-in (attribute-style dict)."""

        def __init__(self, **kw):
            super().__init__(**kw)
            self.__dict__ = self

        @property
        def num_nodes(self):
            return self["pos"].shape[0]

        @property
        def keys(self):
            return list(super().keys())

    tg = sys.modules.get("torch_geometric") or types.ModuleType(
        "torch_geometric")
    tg_data = sys.modules.get("torch_geometric.data") or types.ModuleType(
        "torch_geometric.data")
    if not hasattr(tg_data, "Data"):
        tg_data.Data = ShimData
    sys.modules.setdefault("torch_geometric", tg)
    sys.modules.setdefault("torch_geometric.data", tg_data)

    from sklearn.neighbors import KDTree

    class SphereSampling:
        """transforms.py:301-350 semantics: KDTree radius query, cached on
        the data under KDTREE_KEY; per-point tensors are row-selected."""

        KDTREE_KEY = "kd_tree"

        def __init__(self, radius, sphere_centre, align_origin=True):
            self._radius = radius
            self._centre = np.asarray(sphere_centre)
            if len(self._centre.shape) == 1:
                self._centre = np.expand_dims(self._centre, 0)
            self._align_origin = align_origin

        def __call__(self, data):
            num_points = data.pos.shape[0]
            if not hasattr(data, self.KDTREE_KEY):
                tree = KDTree(np.asarray(data.pos), leaf_size=50)
                setattr(data, self.KDTREE_KEY, tree)
            else:
                tree = getattr(data, self.KDTREE_KEY)
            t_center = torch.FloatTensor(self._centre)
            ind = torch.LongTensor(
                tree.query_radius(self._centre, r=self._radius)[0])
            new_data = tg_data.Data()
            for key in set(data.keys):
                if key == self.KDTREE_KEY:
                    continue
                item = data[key]
                if torch.is_tensor(item) and num_points == item.shape[0]:
                    item = item[ind]
                    if self._align_origin and key == "pos":
                        item -= t_center
                elif torch.is_tensor(item):
                    item = item.clone()
                setattr(new_data, key, item)
            return new_data

    class CylinderSampling(SphereSampling):
        """transforms.py:353-410: same, XY-plane query (z ignored)."""

        def __call__(self, data):
            num_points = data.pos.shape[0]
            key2d = self.KDTREE_KEY + "_2d"
            if not hasattr(data, key2d):
                tree = KDTree(np.asarray(data.pos[:, :2]), leaf_size=50)
                setattr(data, key2d, tree)
            else:
                tree = getattr(data, key2d)
            c = self._centre[:, :2]
            t_center = torch.FloatTensor(c)
            ind = torch.LongTensor(tree.query_radius(c, r=self._radius)[0])
            new_data = tg_data.Data()
            for key in set(data.keys):
                if key == key2d:
                    continue
                item = data[key]
                if torch.is_tensor(item) and num_points == item.shape[0]:
                    item = item[ind]
                    if self._align_origin and key == "pos":
                        item[:, :2] -= t_center
                elif torch.is_tensor(item):
                    item = item.clone()
                setattr(new_data, key, item)
            return new_data

    for p in ("torch_points3d", "torch_points3d.core",
              "torch_points3d.core.data_transform",
              "torch_points3d.core.spatial_ops"):
        _stub_package(p)
    dt = sys.modules["torch_points3d.core.data_transform"]
    dt.SphereSampling = SphereSampling
    dt.CylinderSampling = CylinderSampling
    dt.GridSampling3D = getattr(dt, "GridSampling3D", object)
    dt.SaveOriginalPosId = getattr(dt, "SaveOriginalPosId", object)
    nf = types.ModuleType("torch_points3d.core.spatial_ops.neighbour_finder")
    nf.FAISSGPUKNNNeighbourFinder = object
    sys.modules.setdefault(
        "torch_points3d.core.spatial_ops.neighbour_finder", nf)
    for tv in ("torchvision", "torchvision.transforms"):
        sys.modules.setdefault(tv, types.ModuleType(tv))

    # MapImages calls torch.cuda.synchronize() unconditionally for its
    # timing counters (image.py:240,246,271,299,321,334); CPU-only torch
    # raises on that, so make it the no-op it would be without a GPU.
    if not torch.cuda.is_available():
        torch.cuda.synchronize = lambda *a, **k: None

    mod = load_reference_module(
        "torch_points3d/core/data_transform/multimodal/image.py", name)
    mod.Data = tg_data.Data
    return mod
