"""A/B the separable-upsample bilinear gather vs the 4-tap form on device.

Recipe-bucket shape: maps [4, 256, 128, 128] f32 (the PPM tower's /4 output
for 1024x512 crops), 931k mapping rows at ref resolution — the regime PERF.md
round 5 measured at 24 ms fwd / 92 ms fwd+bwd for the 4-tap form.

Run on the real TPU:  python scripts/bench_upsample_gather.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from deepviewagg_tpu.modules.gather import _bilinear, _bilinear_upsampled

I, WF, HF, C = 4, 256, 128, 128
W, H = 1024, 512
N = 931_000


def timeit(fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    rng = np.random.default_rng(0)
    maps = jnp.asarray(rng.normal(size=(I, WF, HF, C)).astype(np.float32))
    img = jnp.asarray(rng.integers(0, I, N).astype(np.int32))
    xi = jnp.asarray(rng.integers(0, W, N).astype(np.int32))
    yi = jnp.asarray(rng.integers(0, H, N).astype(np.int32))
    xf = xi.astype(jnp.float32) / (W - 1) * WF - 0.5
    yf = yi.astype(jnp.float32) / (H - 1) * HF - 0.5
    ct = jnp.asarray(rng.normal(size=(N, C)).astype(np.float32))

    taps_f = jax.jit(lambda m: _bilinear(m, img, xf, yf))
    up_f = jax.jit(lambda m: _bilinear_upsampled(m, img, xi, yi, W, H))
    taps_g = jax.jit(jax.grad(lambda m: jnp.vdot(_bilinear(m, img, xf, yf), ct)))
    up_g = jax.jit(jax.grad(
        lambda m: jnp.vdot(_bilinear_upsampled(m, img, xi, yi, W, H), ct)))

    print(f"device: {jax.devices()[0].device_kind}")
    a = np.asarray(taps_f(maps))
    b = np.asarray(up_f(maps))
    print(f"max |diff| fwd: {np.abs(a - b).max():.2e}")
    ga = np.asarray(taps_g(maps))
    gb = np.asarray(up_g(maps))
    print(f"max |diff| grad: {np.abs(ga - gb).max():.2e}")
    print(f"4-tap        fwd {timeit(taps_f, maps):7.1f} ms   "
          f"grad {timeit(taps_g, maps):7.1f} ms")
    print(f"upsample+1   fwd {timeit(up_f, maps):7.1f} ms   "
          f"grad {timeit(up_g, maps):7.1f} ms")


if __name__ == "__main__":
    main()
