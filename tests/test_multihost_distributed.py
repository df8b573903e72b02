"""REAL multi-process input pipeline validation (VERDICT r4 coverage row
§2.8 #47: previously "validated single-process only").

Launches TWO OS processes that bring up ``jax.distributed`` on the CPU
backend (4 forced devices each -> one 8-device global mesh, collectives
over Gloo), then drives the production multi-host path end to end in each:

  * ``parallel.multihost.initialize`` / ``is_primary`` with a real
    coordination service (not a simulated process_index);
  * ``HostShardedLoader`` with RUNTIME process defaults — each process must
    see a disjoint half of the sample stream;
  * ``global_device_batch`` assembling host-LOCAL per-device batches into
    one globally-sharded array (every process holds 4 of the 8 shards);
  * a jitted psum over the global mesh whose result both processes agree
    on and which equals the host-side sum over ALL 8 shards — proving the
    assembled array really spans processes.

Mirrors the reference's DataLoader-worker input story at pod scale
(SURVEY.md §2.8 / §5 'distributed communication backend').
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import os, sys
pid = int(sys.argv[1]); port = sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, sys.argv[3])  # repo root, passed by the test

from deepviewagg_tpu.parallel.multihost import (
    HostShardedLoader, global_device_batch, initialize, is_primary)

initialize(f"localhost:{port}", num_processes=2, process_id=pid)
assert jax.process_count() == 2
assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4
assert is_primary() == (pid == 0)

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# --- HostShardedLoader with RUNTIME defaults (no explicit index/count) ---
samples = [{"x": np.full((4,), float(i), np.float32)} for i in range(8)]
mine = list(HostShardedLoader(lambda: iter(samples)))
taken = sorted(int(b["x"][0]) for b in mine)
print(f"SHARD pid={pid} {taken}", flush=True)
assert len(mine) == 4

# --- global assembly: 4 local device batches -> one 8-shard global array --
mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("data",))
gbatch = global_device_batch(mine, mesh)
x = gbatch["x"]
assert x.shape == (8, 4), x.shape
assert len(x.sharding.device_set) == 8

# --- a collective over the global batch: both processes must agree ------
total = jax.jit(lambda a: a.sum(), out_shardings=NamedSharding(mesh, P()))(x)
total = float(np.asarray(jax.device_get(total)))
print(f"TOTAL pid={pid} {total:.1f}", flush=True)
"""


def test_two_process_distributed_pipeline(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    here = os.path.dirname(os.path.abspath(__file__))
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), str(port),
             os.path.dirname(here)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=os.path.dirname(here))
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
        assert p.returncode == 0, out

    # disjoint, exhaustive shards with the round-robin assignment
    shards = {}
    totals = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("SHARD"):
                _, tag, rest = line.split(" ", 2)
                shards[tag] = eval(rest)  # list literal printed above
            if line.startswith("TOTAL"):
                _, tag, val = line.split(" ")
                totals[tag] = float(val)
    assert shards["pid=0"] == [0, 2, 4, 6]
    assert shards["pid=1"] == [1, 3, 5, 7]
    # both processes computed the SAME global sum over ALL 8 samples:
    # sum(i * 4 for i in 0..7) = 112
    expect = float(sum(i * 4 for i in range(8)))
    assert totals["pid=0"] == totals["pid=1"] == expect, (totals, outs)
