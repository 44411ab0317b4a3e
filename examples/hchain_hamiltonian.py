"""Chain Hamiltonians to sparse qubit form: build, MVP, save/load round trip.

Reference role: ``examples/hchainhamiltonian.py`` — assemble a chain
Hamiltonian in fermionic form, transform to qubit Pauli strings, realize it
as a sparse COO matrix with ``PauliStringSum2COO_numpy``, time a
matrix-vector product, and round-trip it through ``scipy.sparse`` npz
serialization.  The reference drives openfermion + pyscf for the molecular
integrals; neither is in this image, so this port (a) uses the repo's own
Jordan-Wigner transform on a hydrogen-chain-style hopping model whose exact
spectrum is available from the free-fermion (FGS) solver — making the
script self-validating where the reference just prints — and (b) runs the
same sparse pipeline on the bundled molecular H2 Hamiltonian.
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
from scipy import sparse

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu import quantum as qu

# --- 1. H-chain hopping model (spinless, n sites) -> JW Pauli strings ----
n = 8
t_hop, mu = 1.0, 0.35
hpq = np.zeros((n, n))
for i in range(n - 1):
    hpq[i, i + 1] = hpq[i + 1, i] = -t_hop
for i in range(n):
    hpq[i, i] = -mu

ls, ws = tc.templates.chems.jordan_wigner_two_body(hpq)
print(f"{len(ls)} Pauli strings for the n={n} chain")

t0 = time.time()
m = qu.PauliStringSum2COO_numpy(ls, ws)
t1 = time.time()
print(f"PauliStringSum2COO_numpy: {t1 - t0:.3f}s, nnz={m.nnz}")

# MVP timing through the sparse backend path
v = np.ones(2**n, dtype=np.complex64)
t1 = time.time()
w = m @ v
t2 = time.time()
print(f"sparse MVP: {t2 - t1:.4f}s, |Hv| = {np.linalg.norm(w):.4f}")

# validation: ground energy against the exact free-fermion solution
e_sparse = float(
    sparse.linalg.eigsh(m.astype(np.complex128), k=1, which="SA")[0][0]
)
eps = np.linalg.eigvalsh(hpq)
e_exact = float(eps[eps < 0].sum())  # fill all negative modes
print(f"ground energy: sparse {e_sparse:.8f} vs free-fermion {e_exact:.8f}")
assert abs(e_sparse - e_exact) < 1e-6

# --- 2. npz round trip (reference saves/loads h-n-chain.npz) -------------
with tempfile.TemporaryDirectory() as tmp:
    path = os.path.join(tmp, f"h-{n}-chain.npz")
    sparse.save_npz(path, m.tocsr())
    m2 = sparse.load_npz(path)
    assert (m.tocsr() != m2).nnz == 0
    print(f"npz round trip OK ({os.path.getsize(path)} bytes)")

# --- 3. molecular H2 through the same sparse pipeline --------------------
h2 = tc.templates.chems.h2_hamiltonian(sparse=True)
h2d = np.asarray(tc.templates.chems.h2_hamiltonian(sparse=False))
e_h2 = float(np.linalg.eigvalsh(h2d).min())
d = h2.todense() if hasattr(h2, "todense") else np.asarray(h2)
assert np.allclose(np.asarray(d), h2d, atol=1e-6)
print(f"molecular H2 (4-qubit JW): E0 = {e_h2:.6f} Ha")
assert abs(e_h2 - (-1.851)) < 5e-2  # literature STO-3G electronic energy
print("OK")
