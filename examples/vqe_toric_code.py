"""VQE ground state of the toric code on a 2x2 torus (8 edge qubits).

Reference role: ``examples/vqe_toric_code.py`` (arXiv:2311.01393 —
finite/generalized local-depth circuits for topological order).

H = -sum_v A_v - sum_p B_p with stars A_v = prod X and plaquettes
B_p = prod Z on the edges of a 2x2 periodic square lattice: 8 qubits,
4 stars and 4 plaquettes with one redundancy each, exact ground energy
-8 and 4-fold topological degeneracy.

Ansatz (FLDC-flavored): the exact Clifford preparation — for a spanning
set of 3 stars, put the root edge in superposition and copy it onto the
star's other edges — with the roots' Hadamards replaced by trainable
ry(θ_v) and a final trainable rx field layer.  At (θ=π/2, φ=0) the
circuit is the exact ground state, so the optimizer must drive the energy
to -8; self-check also verifies every stabilizer expectation reaches +1.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import optax

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu import quantum as qu

L = 2
NQ = 2 * L * L  # edges of the LxL torus


def r_edge(i, j):
    return 2 * ((i % L) * L + (j % L))


def d_edge(i, j):
    return 2 * ((i % L) * L + (j % L)) + 1


def stars():
    out = []
    for i in range(L):
        for j in range(L):
            out.append([r_edge(i, j), r_edge(i, j - 1), d_edge(i, j), d_edge(i - 1, j)])
    return out


def plaquettes():
    out = []
    for i in range(L):
        for j in range(L):
            out.append([r_edge(i, j), r_edge(i + 1, j), d_edge(i, j), d_edge(i, j + 1)])
    return out


def hamiltonian_dense():
    strings, weights = [], []
    for s in stars():
        strings.append([1 if q in s else 0 for q in range(NQ)])
        weights.append(-1.0)
    for p in plaquettes():
        strings.append([3 if q in p else 0 for q in range(NQ)])
        weights.append(-1.0)
    return np.asarray(qu.PauliStringSum2Dense(strings, weights))


def ansatz(params):
    """3 independent stars: ry(θ) on the root + CNOT fan-out, then rx field.

    Each star's ROOT must be an edge untouched by the earlier stars'
    fan-outs (its branches must still agree in |0⟩ before the ry puts it
    in superposition); the CNOT targets may freely overlap — XOR is the
    stabilizer-group product."""
    c = tc.Circuit(NQ)
    ss = stars()
    touched = set()
    for k, s in enumerate(ss[:-1]):  # product of all stars = identity
        root = next(q for q in s if q not in touched)
        rest = [q for q in s if q != root]
        touched.update(s)
        c.ry(root, theta=params[k])
        for q in rest:
            c.cnot(root, q)
    for q in range(NQ):
        c.rx(q, theta=params[len(ss) - 1 + q])
    return c


NPARAMS = 3 + NQ


def main():
    h = jnp.asarray(hamiltonian_dense())

    @jax.jit
    def energy(params):
        psi = ansatz(params).state()
        return jnp.real(psi.conj() @ (h @ psi))

    rng = np.random.default_rng(3)
    params = jnp.asarray(rng.normal(size=NPARAMS) * 0.3 + 0.5, jnp.float32)
    opt = optax.adam(0.05)
    state = opt.init(params)
    vg = jax.jit(jax.value_and_grad(energy))
    e0 = float(energy(params))
    for _ in range(300):
        v, g = vg(params)
        upd, state = opt.update(g, state)
        params = optax.apply_updates(params, upd)
    e_final = float(energy(params))
    print(f"toric code 2x2 torus: E {e0:.4f} -> {e_final:.6f} (exact GS -8)")
    # every stabilizer must be satisfied in the trained state
    c = ansatz(params)
    worst = 1.0
    for s in stars():
        worst = min(worst, float(jnp.real(c.expectation_ps(x=s, reuse=True))))
    for p in plaquettes():
        worst = min(worst, float(jnp.real(c.expectation_ps(z=p, reuse=True))))
    print(f"worst stabilizer expectation: {worst:.6f}")
    assert e_final < -7.99, e_final
    assert worst > 0.99, worst
    print("OK")


if __name__ == "__main__":
    main()
