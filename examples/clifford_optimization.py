"""Differentiable optimization over DISCRETE Clifford circuit structures.

Reference role: ``examples/clifford_optimization.py`` (DQAS-style soft
structure search over a single-qubit Clifford pool + CZ entanglers).

jax-native rework: each slot's gate is a softmax-weighted mixture of the
6-element single-qubit Clifford pool {I, H, S, HS, SH, HSH}; structure
logits are optimized by Adam against the TFIM energy of the (generally
non-unitary) mixture circuit.  After training the structure is HARDENED
(argmax -> a genuine Clifford circuit) and cross-validated on the
bit-packed tableau engine (:class:`StabilizerCircuit`), where every Pauli
expectation is exact and the dense and stabilizer energies must agree to
f32 round-off — a cross-engine identity the reference cannot check (its
example validates by eye).
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

n, nlayers, steps = 6, 4, 150

# single-qubit Clifford pool (numpy constants; lifted per-slot inside jit)
H = np.array([[1, 1], [1, -1]]) / np.sqrt(2)
S = np.diag([1.0, 1j])
I2 = np.eye(2)
POOL = np.stack([I2, H, S, H @ S, S @ H, H @ S @ H]).astype(np.complex64)
POOL_NAMES = ["i", "h", "s", "hs", "sh", "hsh"]
NPOOL = len(POOL)


def soft_circuit(logits, tau=1.0):
    """Mixture circuit: slot (l, q) applies sum_g softmax(logits/tau)[l,q,g] P_g.

    The temperature anneals toward 0 during training so the soft optimum
    concentrates on a DISCRETE structure (without it, argmax-hardening a
    spread-out mixture lands far from the soft objective — measured E≈0
    from a soft -5.9)."""
    w = jax.nn.softmax(logits / tau, axis=-1).astype(jnp.complex64)
    c = tc.Circuit(n)
    for l in range(nlayers):
        for q in range(n):
            m = jnp.einsum("g,gab->ab", w[l, q], jnp.asarray(POOL))
            c.any(q, unitary=m)
        for q in range(0, n - 1, 2):
            c.cz(q, q + 1)
        for q in range(1, n - 1, 2):
            c.cz(q, q + 1)
    return c


def energy_of(c):
    # TFIM: -sum ZZ - g sum X; mixture circuits are non-unitary, so
    # normalize explicitly
    psi = c.state()
    nrm = jnp.real(jnp.vdot(psi, psi))
    e = 0.0
    for q in range(n - 1):
        e = e - jnp.real(c.expectation_ps(z=[q, q + 1], reuse=True))
    for q in range(n):
        e = e - 1.0 * jnp.real(c.expectation_ps(x=[q], reuse=True))
    return e / nrm


@jax.jit
def loss(logits, tau):
    return energy_of(soft_circuit(logits, tau))


def harden(logits):
    """argmax structure -> (dense Circuit, StabilizerCircuit)."""
    idx = np.asarray(jnp.argmax(logits, axis=-1))
    cd = tc.Circuit(n)
    cs = tc.StabilizerCircuit(n)
    for l in range(nlayers):
        for q in range(n):
            name = POOL_NAMES[idx[l, q]]
            for ch in name:
                if ch != "i":
                    getattr(cd, ch)(q)
                    getattr(cs, ch)(q)
        for q0 in list(range(0, n - 1, 2)) + list(range(1, n - 1, 2)):
            cd.cz(q0, q0 + 1)
            cs.cz(q0, q0 + 1)
    return cd, cs


def exact_energy(c):
    e = 0.0
    for q in range(n - 1):
        e -= float(jnp.real(c.expectation_ps(z=[q, q + 1])))
    for q in range(n):
        e -= float(jnp.real(c.expectation_ps(x=[q])))
    return e


def main():
    rng = np.random.default_rng(5)
    logits = jnp.asarray(rng.normal(size=(nlayers, n, NPOOL)) * 0.3, jnp.float32)
    opt = optax.adam(0.08)
    state = opt.init(logits)
    e0 = float(loss(logits, 1.0))
    e_hard0 = exact_energy(harden(logits)[0])
    vg = jax.jit(jax.value_and_grad(loss))
    best = (np.inf, None)
    for i in range(steps):
        tau = jnp.float32(max(0.05, 1.0 - i / (0.7 * steps)))  # anneal
        v, g = vg(logits, tau)
        upd, state = opt.update(g, state)
        logits = optax.apply_updates(logits, upd)
        if i % 10 == 9:  # track the best DISCRETE structure seen
            eh = exact_energy(harden(logits)[0])
            if eh < best[0]:
                best = (eh, np.asarray(logits))
    e_soft = float(loss(logits, 0.05))
    cd, cs = harden(jnp.asarray(best[1]))
    e_dense = exact_energy(cd)
    e_tab = exact_energy(cs)
    print(f"soft objective: {e0:.4f} -> {e_soft:.4f}; "
          f"hardened: init {e_hard0:.4f} -> best {best[0]:.4f}")
    print(f"hardened Clifford energy: dense {e_dense:.6f} | tableau {e_tab:.6f}")
    assert e_soft < e0 - 0.5, (e0, e_soft)  # the search actually moved
    assert abs(e_dense - e_tab) < 1e-4  # cross-engine identity (exact)
    # the discrete search must find a structure clearly below the initial
    # random hardened one (TFIM n=6 g=1 exact GS is ~-7.3; good Clifford
    # structures land in the -4..-6.5 band)
    assert e_dense < min(e_hard0 - 1.0, -3.0), (e_hard0, e_dense)
    print("OK")


if __name__ == "__main__":
    main()
