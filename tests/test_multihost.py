"""Multi-process jax.distributed integration (the multi-host pattern).

Two REAL processes coordinate over localhost (reference
``examples/multi_host/multicontroller_vqe.py`` pattern scaled to CPU):
each runs a term-sharded energy over the global mesh, and the cross-process
AllReduce must deliver identical, correct totals to both.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

WORKER = r"""
import os, sys
sys.path.insert(0, os.environ["REPO"])
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)

from tensorcircuit_ng_tpu.parallel import initialize_distributed

pid = int(sys.argv[1])
initialize_distributed(
    coordinator_address="127.0.0.1:%s" % os.environ["COORD_PORT"],
    num_processes=2,
    process_id=pid,
)

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import tensorcircuit_ng_tpu as tc

assert jax.device_count() == 4 and jax.local_device_count() == 2

n = 6
ls, ws = [], []
for i in range(n - 1):
    l = [0] * n; l[i] = 3; l[i + 1] = 3
    ls.append(l); ws.append(1.0)
for i in range(n):
    l = [0] * n; l[i] = 1
    ls.append(l); ws.append(-1.0)
while len(ls) % 4:
    ls.append([0] * n); ws.append(0.0)

from tensorcircuit_ng_tpu.parallel import term_sharded_expectation

def state_fn(params):
    c = tc.Circuit(n)
    for i in range(n):
        c.h(i)
    for i in range(n):
        c.rx(i, theta=params[i])
    return c.state()

energy = term_sharded_expectation(state_fn, np.array(ls), np.array(ws))
params = jnp.asarray(np.linspace(0.1, 0.6, n), dtype=jnp.float32)
e = float(energy(params))
print("ENERGY %.8f" % e, flush=True)
"""


@pytest.mark.slow  # 14 s: two real processes + jax.distributed init; the
# capability evidence lives in the full CI tier (RUN_SLOW=1)
@pytest.mark.skipif(os.environ.get("CI_NO_SUBPROCESS"), reason="no subprocess")
def test_two_process_distributed_energy(tmp_path):
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = dict(os.environ)
    env["REPO"] = repo
    env["COORD_PORT"] = str(port)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = ""
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            env=env,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)
    energies = []
    for out in outs:
        for line in out.splitlines():
            if line.startswith("ENERGY"):
                energies.append(float(line.split()[1]))
    assert len(energies) == 2
    # both processes agree
    np.testing.assert_allclose(energies[0], energies[1], atol=1e-6)

    # single-process reference
    import jax

    import tensorcircuit_ng_tpu as tc

    n = 6
    c = tc.Circuit(n)
    import jax.numpy as jnp

    params = np.linspace(0.1, 0.6, n)
    for i in range(n):
        c.h(i)
    for i in range(n):
        c.rx(i, theta=float(params[i]))
    expected = 0.0
    for i in range(n - 1):
        expected += float(np.real(np.asarray(c.expectation_ps(z=[i, i + 1]))))
    for i in range(n):
        expected -= float(np.real(np.asarray(c.expectation_ps(x=[i]))))
    np.testing.assert_allclose(energies[0], expected, atol=1e-4)
