"""VQE performance vs two-qubit-gate density (random layouts averaged).

Reference role: ``examples/optperformance_comparison.py`` — train the same
single-qubit-rich ansatz at different *densities* p of two-qubit
entanglers (each candidate CNOT present with probability p, random layouts
averaged over seeds) and compare the converged energies.  The reference
samples layouts with ``unitary_kraus([eye4, cnot], ...)`` inside one traced
circuit; here each sampled layout is a static mask (numpy RNG) compiled
per seed — idiomatic for XLA (static structure, no traced control flow).

Validation: on the N=8 critical TFIM, the dense-entangler ansatz (p=1)
must beat the product ansatz (p=0) by a clear margin and come within 2%
of the exact ground energy, p=0.5 must land between them, and p=0 — a
product ansatz — must sit strictly above the exact ground energy by the
TFIM entanglement gap.
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

tc.set_backend("jax")

n, nlayers, iters, nseeds = 8, 3, 250, 3
pairs = [(i, i + 1) for i in range(n - 1)]

codes = [[3 if k in (a, b) else 0 for k in range(n)] for a, b in pairs]
codes += [[1 if k == i else 0 for k in range(n)] for i in range(n)]
H = jnp.asarray(
    tc.quantum.PauliStringSum2Dense(codes, weight=[1.0] * len(pairs) + [-1.0] * n),
    jnp.complex64,
)
e_exact = float(np.linalg.eigvalsh(np.asarray(H))[0])


def make_energy(masks):
    """Energy closure for one static entangler layout (tuple of tuples of
    bond flags, one per layer)."""

    def energy(params):
        c = tc.Circuit(n)
        for l in range(nlayers):
            for k in range(n):
                c.ry(k, theta=params[l, 0, k])
                c.rz(k, theta=params[l, 1, k])
                c.ry(k, theta=params[l, 2, k])
            for (a, b), on in zip(pairs, masks[l]):
                if on:
                    c.cnot(a, b)
        psi = c.state()
        return jnp.real(jnp.vdot(psi, H @ psi))

    return energy


def train(masks, seed):
    energy = make_energy(masks)
    rng = np.random.default_rng(seed)
    p = jnp.asarray(rng.normal(size=(nlayers, 3, n)) * 0.1, jnp.float32)
    vg = jax.jit(jax.value_and_grad(energy))
    opt = optax.adam(0.05)
    state = opt.init(p)
    best = np.inf
    for _ in range(iters):
        v, g = vg(p)
        best = min(best, float(v))
        upd, state = opt.update(g, state)
        p = optax.apply_updates(p, upd)
    return best


layout_rng = np.random.default_rng(0)
mean_e = {}
for dens in (0.0, 0.5, 1.0):
    es = []
    for s in range(nseeds):
        masks = tuple(
            tuple(bool(layout_rng.random() < dens) for _ in pairs)
            for _ in range(nlayers)
        )
        es.append(train(masks, seed=s))
    mean_e[dens] = float(np.mean(es))
    print(f"density {dens:.2f}: mean best E = {mean_e[dens]:.5f} "
          f"(exact {e_exact:.5f})")

assert mean_e[1.0] < mean_e[0.0] - 0.25, "entanglers gave no benefit"
assert mean_e[0.0] >= mean_e[0.5] - 1e-6 >= mean_e[1.0] - 2e-6, mean_e
# p=0 is a product ansatz: it can never beat the exact ground energy and
# must sit strictly above it by the TFIM entanglement gap
assert mean_e[0.0] > e_exact + 0.2
# p=1 should come within 2% of exact at this depth
assert mean_e[1.0] < e_exact * 0.98
print("OK")
