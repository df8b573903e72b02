"""Per-stage profile of the recipe-scale 2D workload (VERDICT r3 #3).

Times the flagship train step at the S3DIS recipe's real 2D cost
(1024x512 panoramas through the crop ladder, bench.py `_get_recipe_batch`)
and decomposes it:

  * full step, remat on (current default) vs remat OFF vs per-variant
  * forward only
  * 3D-only (branches stripped)
  * tower-only microbench per crop bucket: trunk fwd, trunk+PPM fwd,
    fwd+bwd for each  -> isolates PPM cost and the remat recompute share
  * gather + attention-pool + fusion residual (full minus tower minus 3D)

Run on the real TPU:  python scripts/profile_recipe2d.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import bench
from deepviewagg_tpu.data.toy import flagship_spec


def measure(chain_fn, short=2, long_=6, reps=2):
    dts = []
    for _ in range(reps):
        dts.append((chain_fn(long_) - chain_fn(short)) / (long_ - short))
    if any(d > 0 for d in dts):
        return min(d for d in dts if d > 0)
    return min(abs(d) for d in dts)


def time_train(model, batch, n_valid, tag):
    import optax  # noqa: F401

    from deepviewagg_tpu.train.optimizers import make_optimizer, make_schedule
    from deepviewagg_tpu.train.step import TrainState, make_train_step

    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), batch, train=False)
    tx = make_optimizer(make_schedule("constant", 0.1), grad_clip=10.0)
    state = TrainState.create(variables, tx)
    step = jax.jit(make_train_step(model), donate_argnums=(0,))
    rng = jax.random.PRNGKey(0)
    t0 = time.time()
    state, _ = step(state, batch, rng)
    jax.block_until_ready(state.params)
    print(f"  [{tag}] compile+1 exec {time.time() - t0:.1f}s", flush=True)

    def chain(k):
        nonlocal state
        t0 = time.perf_counter()
        for i in range(k):
            state, m = step(state, batch, jax.random.fold_in(rng, i))
        np.asarray(m["loss"])
        return time.perf_counter() - t0

    dt = measure(chain)
    print(f"  [{tag}] train step {dt * 1e3:.1f} ms  "
          f"({n_valid / dt / 1e3:.1f}k voxels/s)", flush=True)
    return dt


def time_forward(model, batch, n_valid, tag):
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), batch, train=False)

    @jax.jit
    def fwd(variables, batch, feats):
        b = dict(batch)
        b["feats"] = feats
        return model.apply(variables, b, train=False)["logits"]

    feats0 = batch["feats"]
    out = fwd(variables, batch, feats0)
    np.asarray(out[:1])

    def chain(k):
        x = feats0
        t0 = time.perf_counter()
        for _ in range(k):
            x = fwd(variables, batch, x)
        np.asarray(x[:1, :1])
        return time.perf_counter() - t0

    dt = measure(chain)
    print(f"  [{tag}] forward {dt * 1e3:.1f} ms  "
          f"({n_valid / dt / 1e3:.1f}k voxels/s)", flush=True)
    return dt


def time_tower(images_list, tag, remat, with_ppm=True, bf16=True):
    """Tower microbench over the recipe's bucket image tensors."""
    from deepviewagg_tpu.models.segmentation import make_tower
    from deepviewagg_tpu.modules.image_encoders import run_tower

    # 'resnet18_l4' is the dilated trunk the PPM head wraps — the registry
    # has no bare 'resnet18' alias (ADVICE r4)
    fac, _ = make_tower("resnet18_ppm" if with_ppm else "resnet18_l4",
                        "group", False)
    tower = fac()
    params = jax.jit(
        lambda im: tower.init(jax.random.PRNGKey(0), im, True)
    )(images_list[0][:1])

    # run_tower expects a Module-like callable; wrap apply
    class _Wrap:
        def __call__(self, x, t):
            return tower.apply(self.p, x, t)

    w = _Wrap()
    w.p = params

    @jax.jit
    def fwd2(imgs, c):
        return sum(run_tower(w, im + c, True, remat=remat, bf16=bf16).mean()
                   for im in imgs)

    @jax.jit
    def fwdbwd(imgs, c):
        def loss(p):
            w2 = _Wrap()
            w2.p = p
            return sum(
                run_tower(w2, im + c, True, remat=remat, bf16=bf16).mean()
                for im in imgs)
        l, g = jax.value_and_grad(loss)(params)
        return l + jax.tree_util.tree_reduce(
            lambda a, b: a + b.mean(), g, 0.0)

    z = jnp.zeros(())
    np.asarray(fwd2(images_list, z))
    np.asarray(fwdbwd(images_list, z))

    def chain_f(k):
        c = z
        t0 = time.perf_counter()
        for _ in range(k):
            c = fwd2(images_list, c * 1e-9)
        np.asarray(c)
        return time.perf_counter() - t0

    def chain_fb(k):
        c = z
        t0 = time.perf_counter()
        for _ in range(k):
            c = fwdbwd(images_list, c * 1e-9)
        np.asarray(c)
        return time.perf_counter() - t0

    df = measure(chain_f)
    dfb = measure(chain_fb)
    print(f"  [{tag}] tower fwd {df * 1e3:.1f} ms   fwd+bwd {dfb * 1e3:.1f} ms"
          f"   (bwd/fwd {dfb / df:.2f}x)", flush=True)
    return df, dfb


def main():
    print("devices:", jax.devices(), flush=True)
    from deepviewagg_tpu.models.segmentation import MultimodalSeg

    rbatch = bench._get_recipe_batch()
    n_valid = rbatch.pop("meta")["num_valid"]
    rbatch = jax.device_put(rbatch)
    imgs = [jnp.asarray(b) for b in rbatch["bucket_images"]] \
        if "bucket_images" in rbatch else \
        [jnp.asarray(b["images"]) for b in rbatch["mappings"][0]["buckets"]
         if b["images"].shape[0]]
    print("bucket image shapes:", [tuple(i.shape) for i in imgs],
          "n_valid:", n_valid, flush=True)

    spec = flagship_spec()
    lvl, br = spec.branches[0]

    results = {}
    # --- tower microbench: remat x ppm grid (opt-in: --towers) ------------
    if "--towers" in sys.argv:
        for remat in (True, "convs", False):
            for ppm in (True, False):
                tag = f"tower remat={remat} ppm={int(ppm)}"
                results[tag] = time_tower(imgs, tag, remat, with_ppm=ppm)

    # --- full model variants ----------------------------------------------
    import dataclasses

    def with_branch(**kw):
        return dataclasses.replace(
            spec, branches=((lvl, dataclasses.replace(br, **kw)),))

    variants = {
        "full remat=convs": spec,
        "3d-only": dataclasses.replace(spec, branches=()),
    }
    if "--remat" in sys.argv:
        variants["full remat=1"] = with_branch(remat_tower=True)
        variants["full remat=0"] = with_branch(remat_tower=False)
    if "--residual" in sys.argv:
        # decompose the non-tower non-3D residual: each variant removes ONE
        # ingredient of the 2D branch's glue (PERF.md round 5 step budget)
        variants["pool=mean (no group attention)"] = with_branch(
            view_pool="mean", gated=False)
        variants["interpolate=off (1 tap not 4)"] = with_branch(
            interpolate=False)
        variants["frozen tower (no tower bwd)"] = with_branch(frozen=True)
        variants["tower=None (gather raw pixels)"] = with_branch(
            tower=None, out_channels=3)
        variants["pool=bf16 (bf16 gather+atomic)"] = with_branch(
            pool_bf16=True)
    for tag, sp in variants.items():
        model = MultimodalSeg(sp)
        # ablation variants only need the train-step number (fwd adds a
        # whole extra compile each at recipe scale)
        if tag in ("full remat=convs", "3d-only"):
            results[tag + " fwd"] = time_forward(model, rbatch, n_valid, tag)
        results[tag + " train"] = time_train(model, rbatch, n_valid, tag)

    print("\n=== summary ===")
    for k, v in results.items():
        if isinstance(v, tuple):
            print(f"{k}: fwd {v[0]*1e3:.1f} ms  fwd+bwd {v[1]*1e3:.1f} ms")
        else:
            print(f"{k}: {v*1e3:.1f} ms")


if __name__ == "__main__":
    main()
