"""Benchmark harness: fused 3D+2D train-step + forward throughput.

Prints ONE JSON line.  Primary metric: valid voxels per second per chip
through the FULL training step (forward + backward + optimizer update) of
the flagship multimodal model (Res16UNet34 + early ResNet18-PPM branch +
group-attention view pooling) on an S3DIS-shaped synthetic batch; the
inference forward rides along as ``forward_*`` keys.  The reference
publishes no throughput numbers (BASELINE.md), so ``vs_baseline`` compares
against this repo's own recorded round-1 numbers in ``bench_baseline.json``
(train step 344k voxels/s, PERF.md methodology)."""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import json
import sys
import time

import numpy as np

BASELINE_FILE = os.path.join(os.path.dirname(__file__), "bench_baseline.json")

# bump when a new round starts; stamps newly-seeded baselines
CURRENT_ROUND = 5


CACHE = os.path.join(os.path.dirname(__file__), "bench_batch.npz")


def _flatten(tree, prefix=""):
    import numpy as np

    out = {}
    for k, v in tree.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, key + "/"))
        elif isinstance(v, list):
            for i, e in enumerate(v):
                out.update(_flatten(e, f"{key}/{i}/"))
        elif isinstance(v, np.ndarray):
            out[key] = v
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat):
    tree = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node)
        if keys and all(k.isdigit() for k in keys):
            return [listify(node[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(tree)


def _get_batch():
    """Deterministic flagship-shaped batch, cached as a compressed npz
    (committed): the mapping-factory preprocessing is one-time work (as in
    the reference), not part of the benchmarked step."""
    import numpy as np

    if os.path.exists(CACHE):
        z = np.load(CACHE)
        batch = _unflatten({k: z[k] for k in z.files})
        batch["meta"] = {"num_valid": int(batch.pop("num_valid"))}
        return batch
    from deepviewagg_tpu.data.collate import device_view
    from deepviewagg_tpu.data.toy import toy_batch

    batch, bucket, _ = toy_batch(
        n_samples=4, density=260.0, image_size=(256, 128), n_cameras=3,
    )
    n_valid = batch["meta"]["num_valid"]
    flat = _flatten(device_view(batch))
    flat["num_valid"] = np.asarray(n_valid)
    try:
        np.savez_compressed(CACHE, **flat)
    except OSError:
        pass
    batch = device_view(batch)
    batch["meta"] = {"num_valid": n_valid}
    return batch


def _get_recipe_batch():
    """Flagship-SCALE 2D workload: 1024x512 panoramas (the S3DIS recipe's
    resolution_2d, conf/s3dis_benchmark.yaml) routed through the crop-group
    ladder — so the headline bench also measures the model at the recipe's
    real 2D cost, not a toy 256x128 (VERDICT r2 #3).  Built fresh (the image
    tensors are too large to commit as a cache)."""
    import numpy as np

    from deepviewagg_tpu.data.collate import Bucket, collate, device_view
    from deepviewagg_tpu.data.crop_groups import (assign_crop_groups,
                                                  crop_ladder,
                                                  split_mapping_by_bucket)
    from deepviewagg_tpu.data.toy import toy_samples
    from deepviewagg_tpu.ops import voxel as _voxel

    image_size = (1024, 512)
    samples = toy_samples(2, 260.0, image_size, 2, 0.1, 0)
    ladder = crop_ladder(image_size, min_size=64)

    def cap(x, m=256):
        return int(-(-int(x * 1.3) // m) * m)

    # measure per-level voxel counts + per-bucket pixel/image maxima
    coords = np.concatenate([
        np.concatenate([np.full((len(s.coords), 1), b, np.int32),
                        s.coords.astype(np.int32)], 1)
        for b, s in enumerate(samples)
    ])
    counts, cur, stride = [len(coords)], coords, 1
    for _ in range(4):
        cur, _ = _voxel.downsample_coords(cur, stride * 2)
        stride *= 2
        counts.append(len(cur))
    b_pix = [0] * len(ladder)
    b_img = [0] * len(ladder)
    for s in samples:
        ass = assign_crop_groups({"mapping": s.mapping, "images": s.images},
                                 ladder)
        mmp = split_mapping_by_bucket(ass, ladder, include_images=False)
        for bi, bk in enumerate(mmp["buckets"]):
            b_pix[bi] += len(bk["pix_view"])
            b_img[bi] += int((ass["image_bucket"] == bi).sum())
    views = sum(s.mapping.num_views for s in samples)
    pix = sum(s.mapping.num_pixels for s in samples)
    bucket = Bucket(
        level_caps=[cap(c) for c in counts],
        num_batches=len(samples),
        view_cap=cap(views), pix_cap=cap(pix),
        image_cap=sum(b_img),
        image_size=image_size,
        image_ladder=ladder,
        ladder_image_caps=[max(1, i) for i in b_img],
        ladder_pix_caps=[max(cap(p), 256) for p in b_pix],
    )
    batch = collate(samples, bucket, branch_levels=(0,))
    n_valid = batch["meta"]["num_valid"]
    batch = device_view(batch)
    batch["meta"] = {"num_valid": n_valid}
    return batch


# recipe-batch host cache: the builder above is deterministic (seeded toy
# scene) but costs 2-6 min of single-core numpy on slow hosts — enough to
# push the whole bench past a driver timeout.  Bump _RECIPE_CACHE_V when
# the builder's OUTPUT changes (shape/caps/fields), not for unrelated
# edits; the pickle lives outside the repo on purpose (too large to commit).
_RECIPE_CACHE_V = 1
_RECIPE_CACHE = f"/tmp/dva_recipe_batch_v{_RECIPE_CACHE_V}.pkl"
_get_recipe_batch_uncached = _get_recipe_batch


def _get_recipe_batch():
    import pickle

    try:
        if os.path.exists(_RECIPE_CACHE):
            with open(_RECIPE_CACHE, "rb") as f:
                return pickle.load(f)
    except Exception:
        pass  # corrupt/partial cache: rebuild
    batch = _get_recipe_batch_uncached()
    try:
        tmp = _RECIPE_CACHE + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(batch, f, protocol=4)
        os.replace(tmp, _RECIPE_CACHE)  # atomic: no torn reads
    except Exception:
        pass
    return batch


def _backend_alive(timeout_s: int = 240) -> bool:
    """Probe device init in a SUBPROCESS: a dead axon tunnel hangs
    ``jax.devices()`` indefinitely, which would hang the whole bench."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _backend_alive_with_retries() -> bool:
    """A transiently-hung tunnel must not zero a whole round: probe several
    times with backoff (~10 min worst case) before giving up, logging each
    attempt to stderr so the driver transcript shows what happened."""
    schedule = [(120, 0), (120, 30), (180, 60), (240, 0)]
    for i, (probe_s, sleep_s) in enumerate(schedule, 1):
        t0 = time.time()
        ok = _backend_alive(probe_s)
        print(f"bench: backend probe {i}/{len(schedule)} "
              f"({probe_s}s budget) -> {'ok' if ok else 'DEAD'} "
              f"in {time.time() - t0:.0f}s", file=sys.stderr)
        if ok:
            return True
        if sleep_s:
            time.sleep(sleep_s)
    return False


# bf16 peak matmul TFLOP/s per chip by device_kind substring (public specs;
# first match wins, so newer/longer names come first)
_PEAK_BF16_TFLOPS = (
    ("v6", 918.0),       # v6e Trillium
    ("v5p", 459.0),
    ("v5 lite", 197.0), ("v5e", 197.0), ("v5litepod", 197.0),
    ("v4", 275.0),
    ("v3", 123.0),
    ("v2", 45.0),
)


def _mfu_stats(compiled, dt):
    """Roofline accounting (VERDICT r4 next #1b): XLA's own FLOP count of
    the compiled step (post-fusion, so remat recompute is included) ->
    achieved TFLOP/s and MFU vs the chip's bf16 peak.  ``cost_analysis`` is
    a best-effort PJRT API — returns {} where unsupported (e.g. some
    tunneled backends)."""
    import jax

    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
    except Exception:
        return {}
    if flops <= 0 or dt <= 0:
        return {}
    achieved = flops / dt / 1e12
    out = {"step_tflops": round(flops / 1e12, 3),
           "achieved_tflops_per_sec": round(achieved, 2)}
    kind = jax.devices()[0].device_kind.lower()
    for sub, peak in _PEAK_BF16_TFLOPS:
        if sub in kind:
            out["mfu_vs_bf16_peak"] = round(achieved / peak, 4)
            break
    return out


def main():
    if not _backend_alive_with_retries():
        print(json.dumps({
            "metric": "train_step_voxels_per_sec_per_chip",
            "value": 0.0, "unit": "voxels/s", "vs_baseline": 0.0,
            "error": "TPU backend unavailable (device init hung)",
        }))
        return

    import jax

    from deepviewagg_tpu.data.toy import flagship_spec
    from deepviewagg_tpu.models.segmentation import MultimodalSeg

    spec = flagship_spec()
    batch = _get_batch()
    n_valid = batch["meta"]["num_valid"]
    model = MultimodalSeg(spec)

    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), batch, train=False
    )

    # chained-dependency timing: each step's logits feed the next step's
    # features, and a tiny readback closes the chain — `block_until_ready`
    # on the axon tunnel does not reliably wait, so only dependent chains +
    # readback give honest step times.
    @jax.jit
    def step(variables, batch, feats):
        b = dict(batch)
        b["feats"] = feats
        return model.apply(variables, b, train=False)["logits"]

    batch.pop("meta")
    batch = jax.device_put(batch)
    feats0 = batch["feats"]

    out = step(variables, batch, feats0)  # compile + one real execution
    assert np.isfinite(np.asarray(out[:n_valid])).all()

    def chain(k):
        t0 = time.perf_counter()
        x = feats0
        for _ in range(k):
            x = step(variables, batch, x)
        np.asarray(x[:1, :])
        return time.perf_counter() - t0

    # tunnel latency/jitter is large: take the best of several long/short
    # chain differences
    def measure(chain_fn, short=3, long_=13, reps=3):
        dts = []
        for _ in range(reps):
            dts.append((chain_fn(long_) - chain_fn(short)) / (long_ - short))
        if any(d > 0 for d in dts):
            return min(d for d in dts if d > 0)
        return min(abs(d) for d in dts)

    fwd_value = n_valid / measure(chain)

    # --- full training step: forward + backward + optimizer update --------
    import optax

    from deepviewagg_tpu.train.optimizers import make_optimizer, make_schedule
    from deepviewagg_tpu.train.step import TrainState, make_train_step

    tx = make_optimizer(make_schedule("constant", 0.1), grad_clip=10.0)
    state = TrainState.create(variables, tx)
    train_step = jax.jit(make_train_step(model), donate_argnums=(0,))
    rng = jax.random.PRNGKey(0)
    state, _ = train_step(state, batch, rng)  # compile + one execution

    def train_chain(k):
        nonlocal state
        t0 = time.perf_counter()
        for i in range(k):
            state, metrics = train_step(state, batch,
                                        jax.random.fold_in(rng, i))
        np.asarray(metrics["loss"])
        return time.perf_counter() - t0

    train_value = n_valid / measure(train_chain)

    # --- recipe-scale 2D: 1024x512 panoramas through the crop ladder ------
    recipe_value = None
    recipe_mfu = {}
    try:
        rbatch = _get_recipe_batch()
        rn_valid = rbatch.pop("meta")["num_valid"]
        rbatch = jax.device_put(rbatch)
        rvars = jax.jit(model.init, static_argnames=("train",))(
            jax.random.PRNGKey(0), rbatch, train=False
        )
        rstate = TrainState.create(rvars, tx)
        # AOT compile so the SAME executable serves execution and
        # cost_analysis (lowering again after the first donated call would
        # touch deleted buffers and could recompile)
        rstep = jax.jit(make_train_step(model), donate_argnums=(0,)) \
            .lower(rstate, rbatch, rng).compile()
        rstate, _ = rstep(rstate, rbatch, rng)   # one execution

        def recipe_chain(k):
            nonlocal rstate
            t0 = time.perf_counter()
            for i in range(k):
                rstate, m = rstep(rstate, rbatch, jax.random.fold_in(rng, i))
            np.asarray(m["loss"])
            return time.perf_counter() - t0

        recipe_value = rn_valid / measure(recipe_chain, short=2, long_=6,
                                          reps=2)
        recipe_mfu = _mfu_stats(rstep, rn_valid / recipe_value)
    except Exception as e:  # keep the primary metric alive on OOM etc.
        print(f"recipe-scale bench failed: {type(e).__name__}: {e}",
              file=sys.stderr)

    base = {}
    if os.path.exists(BASELINE_FILE):
        try:
            base = json.load(open(BASELINE_FILE))
        except Exception:
            pass

    def base_val(key):
        """Baselines are labeled {'v':..,'round':..,'date':..} entries;
        existing entries are NEVER overwritten (a baseline that silently
        re-seeds itself reads as 1.0 forever)."""
        e = base.get(key)
        if isinstance(e, dict):
            return e.get("v")
        return e  # legacy bare-float format

    changed = False
    pairs = [("value", fwd_value), ("train_value", train_value)]
    if recipe_value is not None:
        pairs.append(("recipe2d_train_value", recipe_value))
    for key, v in pairs:
        if base_val(key) is None:
            base[key] = {"v": v, "round": CURRENT_ROUND,
                         "date": time.strftime("%Y-%m-%d")}
            changed = True
    if changed:
        try:
            json.dump(base, open(BASELINE_FILE, "w"), indent=1)
        except OSError:
            pass

    # round-2 driver-verified reference points (BENCH_r02.json), for
    # cross-round interpretability of the deltas
    R2 = {"train": 381383.7, "forward": 1038903.2}
    result = {
        "metric": "train_step_voxels_per_sec_per_chip",
        "value": round(train_value, 1),
        "unit": "voxels/s",
        "vs_baseline": round(train_value / base_val("train_value"), 4),
        "vs_r2": round(train_value / R2["train"], 4),
        "forward_voxels_per_sec": round(fwd_value, 1),
        "forward_vs_baseline": round(fwd_value / base_val("value"), 4),
        "forward_vs_r2": round(fwd_value / R2["forward"], 4),
    }
    if recipe_value is not None:
        result["recipe2d_train_voxels_per_sec"] = round(recipe_value, 1)
        rb = base_val("recipe2d_train_value")
        if rb:
            result["recipe2d_vs_baseline"] = round(recipe_value / rb, 4)
        for k, v in recipe_mfu.items():
            result[f"recipe2d_{k}"] = v
    print(json.dumps(result))


if __name__ == "__main__":
    main()
