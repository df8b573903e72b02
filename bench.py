"""Benchmark harness: fused 3D+2D forward throughput on real hardware.

Prints ONE JSON line ``{"metric", "value", "unit", "vs_baseline"}``.

Metric: valid voxels per second per chip through the flagship multimodal
forward (Res16UNet34 + early ResNet18-PPM branch + group-attention view
pooling) on an S3DIS-shaped synthetic batch.  The reference publishes no
throughput numbers (BASELINE.md), so ``vs_baseline`` compares against this
repo's own recorded baseline in ``bench_baseline.json`` (created on first
run).
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_FILE = os.path.join(os.path.dirname(__file__), "bench_baseline.json")


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


def main():
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
    short, long_ = 3, 13
    dts = []
    for _ in range(3):
        dts.append((chain(long_) - chain(short)) / (long_ - short))
    dt = min(d for d in dts if d > 0) if any(d > 0 for d in dts) else min(
        abs(d) for d in dts
    )
    value = n_valid / dt

    vs = 1.0
    if os.path.exists(BASELINE_FILE):
        try:
            prior = json.load(open(BASELINE_FILE))["value"]
            vs = value / prior
        except Exception:
            pass
    else:
        try:
            json.dump({"value": value}, open(BASELINE_FILE, "w"))
        except OSError:
            pass

    print(json.dumps({
        "metric": "fused_3d2d_forward_voxels_per_sec_per_chip",
        "value": round(value, 1),
        "unit": "voxels/s",
        "vs_baseline": round(vs, 4),
    }))


if __name__ == "__main__":
    main()
