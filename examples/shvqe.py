"""Schrodinger-Heisenberg VQE: a classically-conjugated Clifford layer.

Reference role: ``examples/shvqe.py`` — augment a shallow parametrized
"Schrodinger" circuit with a discrete-searched Clifford "Heisenberg" layer
that is never executed on the device: the Clifford is pushed into the
Hamiltonian classically (H -> U_C^dag H U_C), so the quantum circuit stays
shallow while the effective ansatz gains entangling power.  The reference
optimizes the Clifford structure DQAS-style in tensorflow; this port keeps
the same two-level structure with a jax inner loop and an explicit discrete
search over candidate Clifford layers (the search space is small enough to
enumerate, which also makes the demo deterministic).

Validation: the searched Heisenberg layer strictly improves on the pure
Schrodinger circuit at EQUAL quantum depth (the identity layer is in the
candidate pool, so the search can never lose), the hybrid lands within 5%
of the exact N=8 critical-TFIM ground energy with a depth-1 circuit, and
the conjugated-Hamiltonian energy matches a direct dense simulation of
U_C applied in-circuit (the statement that the Clifford never needs to
run on the device).
"""

import os
import sys
from itertools import combinations

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import optax

import tensorcircuit_ng_tpu as tc

tc.set_backend("jax")

n = 8
pairs = [(i, i + 1) for i in range(n - 1)]

# dense critical TFIM Hamiltonian (g = 1)
codes = [[3 if k in (a, b) else 0 for k in range(n)] for a, b in pairs]
codes += [[1 if k == i else 0 for k in range(n)] for i in range(n)]
weights = [1.0] * len(pairs) + [-1.0] * n
H = np.asarray(tc.quantum.PauliStringSum2Dense(codes, weight=weights))
e_exact = float(np.linalg.eigvalsh(H)[0])


def clifford_unitary(layer):
    """Dense unitary of one Heisenberg layer: chosen CZ bonds, then an
    optional Hadamard wall."""
    cz_bonds, hwall = layer
    c = tc.Circuit(n)
    for (a, b) in cz_bonds:
        c.cz(a, b)
    if hwall:
        for i in range(n):
            c.h(i)
    return np.asarray(c.matrix())


def schrodinger_energy(params, h_eff):
    """Shallow depth-1 hardware ansatz measured against the rotated H."""
    c = tc.Circuit(n)
    for i in range(n):
        c.ry(i, theta=params[0, i])
    for i in range(0, n - 1, 2):
        c.cnot(i, i + 1)
    for i in range(1, n - 1, 2):
        c.cnot(i, i + 1)
    for i in range(n):
        c.ry(i, theta=params[1, i])
    psi = c.state()
    return jnp.real(jnp.vdot(psi, h_eff @ psi))


def train(h_eff, seed, iters=300):
    rng = np.random.default_rng(seed)
    p = jnp.asarray(rng.normal(size=(2, n)) * 0.1, jnp.float32)
    h_eff = jnp.asarray(h_eff, jnp.complex64)
    vg = jax.jit(jax.value_and_grad(lambda q: schrodinger_energy(q, h_eff)))
    opt = optax.adam(0.05)
    state = opt.init(p)
    best = np.inf
    for _ in range(iters):
        v, g = vg(p)
        best = min(best, float(v))
        upd, state = opt.update(g, state)
        p = optax.apply_updates(p, upd)
    return best, p


# --- baseline: pure Schrodinger ansatz, no Heisenberg layer -------------
e_plain, _ = train(H, seed=1)
print(f"pure Schrodinger (depth 1):      E = {e_plain:.5f}")

# --- discrete search over Heisenberg Clifford layers ---------------------
# candidates: identity (so the search can never lose), CZ on every second
# bond, every bond, and the sparse two-bond selections, each with and
# without a trailing Hadamard wall
bond_sets = [(), tuple(pairs[::2]), tuple(pairs), tuple(pairs[1::2])]
bond_sets += [bonds for bonds in combinations(pairs[::2], 2)]
cand = [(bs, hw) for bs in bond_sets for hw in (False, True)]
results = []
for layer in cand:
    u = clifford_unitary(layer)
    h_eff = u.conj().T @ H @ u
    e, p_star = train(h_eff, seed=1, iters=200)
    results.append((e, layer, h_eff, p_star))
results.sort(key=lambda t: t[0])
e_sh, layer_star, h_star, p_star = results[0]
bonds_star, hwall_star = layer_star
print(f"SHVQE (best Clifford cz={bonds_star} hwall={hwall_star}): "
      f"E = {e_sh:.5f}  exact = {e_exact:.5f}")

assert e_sh < e_plain - 1e-3, "Heisenberg layer failed to help"
assert abs(e_sh - e_exact) < 5e-2 * abs(e_exact), (e_sh, e_exact)

# --- cross-check: conjugated-H energy == running the Clifford in-circuit --
c = tc.Circuit(n)
for i in range(n):
    c.ry(i, theta=p_star[0, i])
for i in range(0, n - 1, 2):
    c.cnot(i, i + 1)
for i in range(1, n - 1, 2):
    c.cnot(i, i + 1)
for i in range(n):
    c.ry(i, theta=p_star[1, i])
for (a, b) in bonds_star:
    c.cz(a, b)
if hwall_star:
    for i in range(n):
        c.h(i)
psi = np.asarray(c.state())
e_circuit = float(np.real(psi.conj() @ (H @ psi)))
e_conj = float(schrodinger_energy(p_star, jnp.asarray(h_star, jnp.complex64)))
print(f"conjugated-H {e_conj:.6f} vs in-circuit {e_circuit:.6f}")
assert abs(e_conj - e_circuit) < 1e-4
print("OK")
