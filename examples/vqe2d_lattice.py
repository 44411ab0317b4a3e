"""2D TFIM VQE on a 3x3 square lattice through the lattice templates.

Reference examples vqe2d.py / vqe2d_lattice.py role: build the bond list
from `templates.lattice.SquareLattice`, schedule the bonds into
non-overlapping layers with `get_compatible_layers`, run fused `zzrx_layer`
sweeps per bond layer, and read out with the fused Ising-energy custom VJP.
Self-validating against the exact dense ground energy.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

# exact-oracle validation example: run on host CPU (the axon TPU
# tunnel cannot fetch complex host values; see CLAUDE.md)
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import optax

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu.templates.lattice import SquareLattice, get_compatible_layers

L1 = L2 = 3
n = L1 * L2
g = 3.0  # strong transverse field (paramagnetic side: shallow ansatz suffices)

lat = SquareLattice((L1, L2), pbc=False)
bonds = [(int(a), int(b)) for a, b in lat.get_neighbor_pairs(k=1)]
layers = get_compatible_layers(bonds)  # non-overlapping bond layers
nlayers = 3  # ansatz depth (sweeps over all bond layers)


def energy(params):
    c = tc.Circuit(n)
    c.h_layer()
    k = 0
    for l in range(nlayers):
        for lay in layers:
            c.zzrx_layer(lay, params[k, 0, : len(lay)], params[k, 1])
            k += 1
    return c.expectation_zzx_energy(bonds, 1.0, -g)


def exact_ground():
    zmat = np.diag([1.0, -1.0])
    xmat = np.array([[0.0, 1.0], [1.0, 0.0]])

    def kron_at(op, qs):
        out = np.ones((1, 1))
        for i in range(n):
            out = np.kron(out, op if i in qs else np.eye(2))
        return out

    H = np.zeros((2**n, 2**n))
    for a, b in bonds:
        H += kron_at(zmat, (a, b))
    for q in range(n):
        H -= g * kron_at(xmat, (q,))
    return float(np.linalg.eigvalsh(H)[0])


def main():
    nblocks = nlayers * len(layers)
    rng = np.random.default_rng(42)
    params = jnp.asarray(rng.normal(size=(nblocks, 2, n)) * 0.05, jnp.float32)
    opt = optax.adam(0.05)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        v, grad = jax.value_and_grad(energy)(p)
        updates, s = opt.update(grad, s)
        return optax.apply_updates(p, updates), s, v

    for i in range(220):
        params, state, v = step(params, state)
        if i % 50 == 0:
            print(f"  step {i:3d}  E = {float(v):.5f}")
    e0 = exact_ground()
    rel = (float(v) - e0) / abs(e0)
    print(f"2D TFIM {L1}x{L2}, g={g}: VQE {float(v):.5f} vs exact {e0:.5f} "
          f"(rel. err {rel:.2%})")
    assert float(v) >= e0 - 1e-6  # variational bound
    assert rel < 0.02, rel
    print("OK")


if __name__ == "__main__":
    main()
