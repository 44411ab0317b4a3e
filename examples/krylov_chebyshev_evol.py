"""Real-time evolution three ways: Krylov, Chebyshev, and exact.

Reference ``examples/krylov_time_evolution.py`` + ``chebyshev_evol.py``
roles: evolve a Néel state under the XXZ Hamiltonian and cross-check
⟨Z_0⟩ between ``timeevol.krylov_evol``, ``timeevol.chebyshev_evol``, and
dense ``expm``.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu import timeevol, quantum as qu

n, t = 8, 1.3
terms, ws = [], []
for i in range(n - 1):
    for p in (1, 2, 3):
        l = [0] * n
        l[i] = p
        l[i + 1] = p
        terms.append(l)
        ws.append(1.0 if p != 3 else 0.7)
H = qu.PauliStringSum2COO(
    jnp.asarray(np.array(terms), dtype=jnp.int32),
    jnp.asarray(np.array(ws), dtype=jnp.float32),
)
Hd = np.asarray(qu.PauliStringSum2Dense(
    jnp.asarray(np.array(terms), dtype=jnp.int32),
    jnp.asarray(np.array(ws), dtype=jnp.float32),
))

psi0 = np.zeros(2**n, dtype=np.complex64)
psi0[int("10" * (n // 2), 2)] = 1.0

# 1. Krylov (scan-jittable Lanczos)
psi_k = timeevol.krylov_evol(H, jnp.asarray(psi0), jnp.asarray([t]), subspace_dimension=30)[0]

# 2. Chebyshev (Bessel-weighted polynomial of the rescaled H)
emax = float(np.linalg.eigvalsh(Hd)[-1]) + 0.5
emin = float(np.linalg.eigvalsh(Hd)[0]) - 0.5
psi_c = timeevol.chebyshev_evol(H, jnp.asarray(psi0), t, (emax, emin), k=80)

# 3. exact dense
import scipy.linalg as sl

psi_e = sl.expm(-1j * t * Hd) @ psi0

Z0 = np.kron(np.diag([1.0, -1.0]), np.eye(2 ** (n - 1)))


def z0(psi):
    psi = np.asarray(psi)
    psi = psi / np.linalg.norm(psi)
    return float(np.real(psi.conj() @ (Z0 @ psi)))


print(f"<Z_0> krylov:    {z0(psi_k):+.6f}")
print(f"<Z_0> chebyshev: {z0(psi_c):+.6f}")
print(f"<Z_0> exact:     {z0(psi_e):+.6f}")
assert abs(z0(psi_k) - z0(psi_e)) < 1e-4
assert abs(z0(psi_c) - z0(psi_e)) < 1e-4
print("all three agree")
