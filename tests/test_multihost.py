"""Multi-host input pipeline + data-parallel wrapper integration
(VERDICT r1 item #8): HostShardedLoader partitioning, global array assembly
through the 8-device mesh, and derived (not hardcoded) metric out_specs."""

import jax
import jax.numpy as jnp
import numpy as np

from deepviewagg_tpu.parallel.mesh import (
    data_parallel_step, make_mesh, replicate,
)
from deepviewagg_tpu.parallel.multihost import (
    HostShardedLoader, global_device_batch,
)


def test_host_sharded_loader_partitions_disjoint_exhaustive():
    items = list(range(23))
    shards = [
        list(HostShardedLoader(lambda: iter(items), process_index=pi,
                               process_count=4))
        for pi in range(4)
    ]
    flat = sorted(x for s in shards for x in s)
    assert flat == items                       # exhaustive
    assert all(len(set(s)) == len(s) for s in shards)
    assert {len(s) for s in shards} <= {5, 6}  # balanced


class _ToyState:
    pass


def test_global_batch_through_data_parallel_step():
    mesh = make_mesh()
    n = len(jax.devices())
    assert n == 8

    import optax
    from flax import struct

    class S(struct.PyTreeNode):
        step: jnp.ndarray
        w: jnp.ndarray

    def step_fn(state, batch, rng):
        # gradient of mean((x*w - y)^2), pmean'd like the real train step
        def loss_fn(w):
            return jnp.mean((batch["x"] * w - batch["y"]) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(state.w)
        g = jax.lax.pmean(g, "data")
        loss = jax.lax.pmean(loss, "data")
        new = state.replace(step=state.step + 1, w=state.w - 0.1 * g)
        # a NON-standard metric dict: the wrapper must not assume keys
        return new, {"loss": loss, "preds": batch["x"] > 0,
                     "my_custom_metric": loss * 2}

    state = S(step=jnp.zeros((), jnp.int32), w=jnp.ones(()))
    state = replicate(state, mesh)

    rng = np.random.default_rng(0)
    per_dev = [
        {"x": rng.normal(size=(16,)).astype(np.float32),
         "y": rng.normal(size=(16,)).astype(np.float32)}
        for _ in range(n)
    ]
    gbatch = global_device_batch(per_dev, mesh)
    # assembled arrays are globally sharded over the data axis
    x = gbatch["x"]
    assert x.shape == (n, 16)
    assert len(x.sharding.device_set) == n

    run = data_parallel_step(step_fn, mesh, donate_state=False)
    new_state, metrics = run(state, gbatch, jax.random.PRNGKey(0))
    assert int(np.asarray(new_state.step).max()) == 1
    assert np.isfinite(float(np.asarray(metrics["loss"])))
    # custom key survived with replicated spec; preds stayed per-device
    np.testing.assert_allclose(
        np.asarray(metrics["my_custom_metric"]),
        2 * np.asarray(metrics["loss"]), rtol=1e-6,
    )
    assert np.asarray(metrics["preds"]).shape == (n, 16)
    # the update matches the host-side computation on the SAME global data
    xs = np.stack([b["x"] for b in per_dev])
    ys = np.stack([b["y"] for b in per_dev])
    g_host = np.mean(2 * (xs * 1.0 - ys) * xs)
    np.testing.assert_allclose(
        float(np.asarray(new_state.w).reshape(-1)[0]),
        1.0 - 0.1 * g_host, rtol=1e-5,
    )
