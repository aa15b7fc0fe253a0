"""Multi-process (multi-host) codepath (SURVEY §5: jax.distributed + DCN):
two OS processes form one JAX distributed runtime over the CPU backend,
build a global mesh spanning both processes' devices, and run the sharded
Hessian-assembly reduction (the distributed-Schur psum) across the process
boundary.  This exercises exactly the `jax.distributed.initialize` + global
mesh + cross-process collective path a multi-host pod deployment uses."""
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np

WORKER = r"""
import os, sys
import numpy as np
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=sys.argv[1],
    num_processes=2,
    process_id=int(sys.argv[2]),
)
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

devs = jax.devices()
assert len(devs) == 4, devs  # 2 per process, global view
mesh = Mesh(np.array(devs).reshape(4), ("lm",))

# landmark-sharded JtJ contributions psum-reduced across processes —
# the communication pattern of parallel/sharded.py's distributed Schur
def contrib(J, r):
    H = jnp.einsum("ld,le->de", J, J)
    b = jnp.einsum("ld,l->d", J, r)
    return (jax.lax.psum(H, "lm"), jax.lax.psum(b, "lm"))

L, D = 64, 8
rng = np.random.default_rng(0)
J = jnp.asarray(rng.normal(size=(L, D)), jnp.float32)
r = jnp.asarray(rng.normal(size=(L,)), jnp.float32)
f = jax.jit(shard_map(contrib, mesh=mesh,
                      in_specs=(P("lm"), P("lm")), out_specs=(P(), P())))
H, b = f(J, r)
H_ref = np.asarray(J).T @ np.asarray(J)
b_ref = np.asarray(J).T @ np.asarray(r)
# fetch only locally-addressable shards (replicated -> any local shard)
H_local = np.asarray(H.addressable_data(0))
b_local = np.asarray(b.addressable_data(0))
assert np.allclose(H_local, H_ref, atol=1e-4), np.abs(H_local - H_ref).max()
assert np.allclose(b_local, b_ref, atol=1e-4)
print(f"proc {sys.argv[2]} OK", flush=True)
"""


def test_two_process_distributed_psum(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen([sys.executable, "-c", WORKER, coord, str(i)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         env=env, cwd=str(Path(__file__).parent.parent))
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"proc {i} OK" in out
