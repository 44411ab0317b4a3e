"""Hamiltonian construction four ways (reference ``hamiltonian_building.py`` role).

The same Heisenberg chain as (1) dense matrix, (2) host-resident COO
(axon-safe numpy buffers), (3) matrix-free MVP closure, and (4) graph
input — all agreeing on ⟨ψ|H|ψ⟩ and ground energy.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

import networkx as nx

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu import quantum as qu

n = 8
terms, ws = [], []
for i in range(n - 1):
    for p in (1, 2, 3):
        l = [0] * n
        l[i] = p
        l[i + 1] = p
        terms.append(l)
        ws.append(1.0)
ls = jnp.asarray(np.array(terms), dtype=jnp.int32)
weights = jnp.asarray(np.array(ws), dtype=jnp.float32)

H_dense = qu.PauliStringSum2Dense(ls, weights)
H_coo = qu.PauliStringSum2COO(ls, weights)
mvp = qu.PauliStringSum2MVP(ls, weights)

g = nx.path_graph(n)
H_graph = qu.heisenberg_hamiltonian(g, hxx=1.0, hyy=1.0, hzz=1.0, sparse=False)

rng = np.random.default_rng(0)
psi = rng.standard_normal(2**n) + 1j * rng.standard_normal(2**n)
psi = (psi / np.linalg.norm(psi)).astype(np.complex64)

e_dense = float(np.real(np.vdot(psi, np.asarray(H_dense) @ psi)))
e_coo = float(np.real(np.vdot(psi, np.asarray(H_coo.matvec(jnp.asarray(psi))))))
e_mvp = float(np.real(np.vdot(psi, np.asarray(mvp(jnp.asarray(psi))))))
e_graph = float(np.real(np.vdot(psi, np.asarray(H_graph) @ psi)))

print(f"<psi|H|psi>: dense {e_dense:+.6f}  coo {e_coo:+.6f}  mvp {e_mvp:+.6f}  graph {e_graph:+.6f}")
for e in (e_coo, e_mvp, e_graph):
    assert abs(e - e_dense) < 1e-3

e0 = float(np.linalg.eigvalsh(np.asarray(H_dense).real)[0])
print(f"ground energy (dense diag): {e0:.6f}")
print("all four constructions agree")
