"""Multi-process JAX runtime: 2-process local demonstration
(SURVEY.md section 5.8(b); VERDICT round-1 'multi-host service placement').

Spawns two fresh Python processes that join one coordinator via
jax.distributed.initialize (the path diffusionhandles_tpu.parallel
.distributed wires into every service entry point), checks both see the
global process topology, and runs a cross-process collective.
"""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ.pop("XLA_FLAGS", None)
sys.path.insert(0, os.environ["DIFFHANDLES_REPO"])
from diffusionhandles_tpu.parallel.distributed import maybe_init_from_env
import jax
jax.config.update("jax_platforms", "cpu")
info = maybe_init_from_env()
assert info is not None, "env contract not detected"
assert info["num_processes"] == 2, info
import jax.numpy as jnp
from jax.experimental import multihost_utils
# cross-process sum: each process contributes (process_id + 1)
val = jnp.float32(jax.process_index() + 1)
total = multihost_utils.process_allgather(val).sum()
assert float(total) == 3.0, float(total)
print(f"OK process={info['process_id']} global_devices="
      f"{info['global_devices']} total={float(total)}", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_runtime():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    port = _free_port()
    code = _WORKER
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)  # no virtual-device forcing in workers
        env.update(DIFFHANDLES_COORDINATOR=f"localhost:{port}",
                   DIFFHANDLES_NUM_PROCESSES="2",
                   DIFFHANDLES_PROCESS_ID=str(pid),
                   DIFFHANDLES_REPO=repo)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", code], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert f"OK process={pid}" in out, out
