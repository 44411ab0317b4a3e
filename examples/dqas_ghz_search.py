"""DQAS architecture search for GHZ preparation (reference ``ghz_dqas.py``).

Searches over an op pool {H-on-0, CNOT01, CNOT12, identity} for a 3-slot
architecture maximizing GHZ fidelity, using the reference-signature
``DQAS_search`` with REINFORCE structure gradients — JAX-native.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu.applications import dqas


OPS = ["H0", "CNOT01", "CNOT12", "I"]


def kernel(gdata, nnp, preset):
    def lossf(theta):
        c = tc.Circuit(3)
        for j in preset:
            op = OPS[j]
            if op == "H0":
                c.h(0)
            elif op.startswith("CNOT"):
                c.cnot(int(op[4]), int(op[5]))
        psi = c.state()
        ghz = np.zeros(8); ghz[0] = ghz[-1] = 1 / np.sqrt(2)
        return 1.0 - jnp.abs(jnp.vdot(jnp.asarray(ghz, dtype=psi.dtype), psi)) ** 2

    return jax.value_and_grad(lossf)(nnp)


if __name__ == "__main__":
    np.random.seed(2)
    stp, nnp, hist = dqas.DQAS_search(
        kernel, op_pool=OPS, p=3, batch=32, epochs=150, prob_clip=0.9, verbose=False
    )
    prob = np.asarray(jax.nn.softmax(stp, axis=-1))
    best = [OPS[int(i)] for i in prob.argmax(axis=1)]
    print("best architecture:", best)
    print("final mean loss:", hist[-1])
