"""Capture a TPU profiler trace of the recipe-scale flagship train step and
print the top HLO ops by self time (offline parse via
tensorboard_plugin_profile — no TensorBoard server needed).

Usage:  python scripts/trace_recipe_step.py [--bf16-pool]

Complements scripts/profile_recipe2d.py's variant ablation with an exact
per-op accounting of the same step (PERF.md round 5).
"""

import glob
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

import bench
from deepviewagg_tpu.data.toy import flagship_spec


def main():
    import dataclasses

    from deepviewagg_tpu.models.segmentation import MultimodalSeg
    from deepviewagg_tpu.train.optimizers import make_optimizer, make_schedule
    from deepviewagg_tpu.train.step import TrainState, make_train_step

    batch = bench._get_recipe_batch()
    n_valid = batch.pop("meta")["num_valid"]
    batch = jax.device_put(batch)
    spec = flagship_spec()
    if "--bf16-pool" in sys.argv:
        lvl, br = spec.branches[0]
        spec = dataclasses.replace(spec, branches=(
            (lvl, dataclasses.replace(br, pool_bf16=True)),))
    model = MultimodalSeg(spec)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), batch, train=False)
    tx = make_optimizer(make_schedule("constant", 0.1), grad_clip=10.0)
    state = TrainState.create(variables, tx)
    step = jax.jit(make_train_step(model), donate_argnums=(0,))
    rng = jax.random.PRNGKey(0)
    state, _ = step(state, batch, rng)
    jax.block_until_ready(state.params)

    logdir = "/tmp/jaxtrace"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        for i in range(4):
            state, m = step(state, batch, jax.random.fold_in(rng, i))
        jax.block_until_ready(m["loss"])
    print("n_valid:", n_valid, flush=True)

    xs = glob.glob(logdir + "/**/*.xplane.pb", recursive=True)
    print("xplanes:", xs, flush=True)
    if not xs:
        print("NO TRACE CAPTURED (tunnel may not support profiling)")
        return
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    for tool in ("hlo_stats", "hlo_op_stats", "op_profile",
                 "framework_op_stats", "tensorflow_stats"):
        try:
            data, _ = rtd.xspace_to_tool_data(xs, tool, {})
            if isinstance(data, bytes):
                data = data.decode()
            path = f"/tmp/trace_{tool}.json"
            open(path, "w").write(data)
            print(f"tool {tool}: {len(data)} bytes -> {path}", flush=True)
        except Exception as e:
            print(f"tool {tool}: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
