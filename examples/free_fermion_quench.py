"""Free-fermion (Gaussian state) quench (reference ``fgs.py`` role).

Kitaev-chain quench on 40 sites with the O(L²) correlation-matrix
simulator — then the same quench at L=8 cross-checked against the dense
2^L Jordan-Wigner oracle (``FGSTestSimulator``).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import tensorcircuit_ng_tpu as tc

# -- large system: 40 sites, milliseconds per step -------------------------
L = 40
sim = tc.FGSSimulator(L, filled=list(range(L // 2)))
t0 = time.time()
for step in range(20):
    for i in range(L - 1):
        sim.evol_hp(i, i + 1, chi=0.1)  # hopping
    for i in range(0, L - 1, 2):
        sim.evol_sp(i, i + 1, chi=0.05)  # pairing
nbar = float(np.real(np.asarray(sim.expectation_2body(L // 2, L // 2 + L))))
print(f"L={L}: 20 quench steps in {time.time()-t0:.2f} s, <n_mid> = {nbar:.4f}")

# -- small system: validate against the dense JW oracle --------------------
L = 8
sim = tc.FGSSimulator(L, filled=list(range(L // 2)))
ref = tc.FGSTestSimulator(L, filled=list(range(L // 2)))
for i in range(L - 1):
    sim.evol_hp(i, i + 1, chi=0.3)
    ref.evol_hp(i, i + 1, chi=0.3)
for i in range(0, L - 1, 2):
    sim.evol_sp(i, i + 1, chi=0.2)
    ref.evol_sp(i, i + 1, chi=0.2)

c_fgs = np.asarray(sim.get_cmatrix())
c_ref = np.asarray(ref.get_cmatrix())
err = np.abs(c_fgs - c_ref).max()
s_fgs = float(np.real(np.asarray(sim.entropy(list(range(L // 2))))))
s_ref = float(np.real(np.asarray(ref.entropy(list(range(L // 2))))))
print(f"L={L}: correlation matrix vs JW oracle err {err:.2e}")
print(f"half-chain entropy: FGS {s_fgs:.5f} vs dense {s_ref:.5f}")
assert err < 1e-4 and abs(s_fgs - s_ref) < 1e-4
print("Gaussian simulator matches the dense oracle")
