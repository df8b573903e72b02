#!/usr/bin/env python
"""Reproduce the pallas segmented-scan vs XLA scatter numbers (PERF.md).

Run on a TPU host: ``python scripts/bench_segment.py [--shape atomic|view]``.
Chained variants feed each iteration's output into the next so the timing
is honest under async dispatch (bench.py methodology).
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


SHAPES = {
    "atomic": (388_000, 82_000, 128),   # pixel -> view pool, flagship batch
    "view": (82_000, 44_800, 128),      # view -> point pool
}


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--shape", default="atomic", choices=sorted(SHAPES))
    parser.add_argument("--iters", type=int, default=20)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from deepviewagg_tpu.ops import pallas_segment as ps

    e, s, c = SHAPES[args.shape]
    rng = np.random.default_rng(0)
    ids = np.sort(rng.integers(0, s, e)).astype(np.int32)
    x = jnp.asarray(rng.normal(size=(e, c)).astype(np.float32))
    idsj = jnp.asarray(ids)
    ptr = jnp.asarray(np.searchsorted(ids, np.arange(s + 1)), jnp.int32)
    valid = jnp.asarray(rng.random(e) > 0.1)

    def timeit(fn, x0, n=args.iters):
        # chained: each iteration's output feeds the next, closed by a host
        # readback (block_until_ready alone is unreliable on the tunneled
        # chip — bench.py methodology)
        def step(xc):
            out = fn(xc)
            return xc * 0.999 + out[jnp.minimum(idsj, s - 1)] * 1e-6

        step_j = jax.jit(step)
        xc = step_j(x0)
        np.asarray(xc[:1, :1])
        t0 = time.perf_counter()
        xc = x0
        for _ in range(n):
            xc = step_j(xc)
        np.asarray(xc[:1, :1])
        return (time.perf_counter() - t0) / n * 1e3

    pairs = [
        ("sum", jax.jit(lambda x: jax.ops.segment_sum(
            x, idsj, num_segments=s, indices_are_sorted=True)),
         jax.jit(lambda x: ps.segment_sum_pallas(x, idsj, s, None, ptr))),
        ("max", jax.jit(lambda x: jax.ops.segment_max(
            jnp.where(valid[:, None], x, -1e30), idsj, num_segments=s,
            indices_are_sorted=True)),
         jax.jit(lambda x: ps.segment_max_pallas(x, idsj, s, valid, ptr))),
    ]
    print(f"[{args.shape}] E={e} S={s} C={c} on {jax.devices()[0].device_kind}")
    for name, xla, pal in pairs:
        t_x, t_p = timeit(xla, x), timeit(pal, x)  # noqa: F841
        print(f"  {name}: xla {t_x:7.3f} ms  pallas+ptr {t_p:7.3f} ms "
              f"({t_x / t_p:.2f}x)")
    g_x = jax.jit(jax.grad(lambda x: jnp.sum(pairs[1][1](x))))
    g_p = jax.jit(jax.grad(lambda x: jnp.sum(pairs[1][2](x))))
    t_x, t_p = timeit(g_x, x), timeit(g_p, x)
    print(f"  max fwd+bwd: xla {t_x:7.3f} ms  pallas+ptr {t_p:7.3f} ms "
          f"({t_x / t_p:.2f}x)")


if __name__ == "__main__":
    main()
