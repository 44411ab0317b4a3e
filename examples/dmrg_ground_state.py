"""Two-site DMRG ground state (reference DMRG-adjacent examples' role).

Heisenberg chain ground state by the two-site DMRG sweep, compared to
exact diagonalization at n=12 and extended to n=60 where only the MPS
representation exists.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu import dmrg as dmrg_mod
from tensorcircuit_ng_tpu import quantum as qu

# -- n=12: compare to exact diagonalization -------------------------------
n = 12
mpo = dmrg_mod.xxz_mpo(n, delta=1.0)  # Heisenberg: XX+YY+ZZ
e_dmrg, mps = dmrg_mod.dmrg(mpo, chi=32, sweeps=6)
terms, ws = [], []
for i in range(n - 1):
    for p in (1, 2, 3):
        l = [0] * n
        l[i] = p
        l[i + 1] = p
        terms.append(l)
        ws.append(1.0)
H = np.asarray(
    qu.PauliStringSum2Dense(
        jnp.asarray(np.array(terms), dtype=jnp.int32),
        jnp.asarray(np.array(ws), dtype=jnp.float32),
    )
).real
e_exact = float(np.linalg.eigvalsh(H)[0])
print(f"n={n}: DMRG {float(e_dmrg):.6f} vs exact {e_exact:.6f} "
      f"(err {abs(float(e_dmrg)-e_exact):.2e})")
assert abs(float(e_dmrg) - e_exact) < 1e-3

# -- n=60: far beyond dense diagonalization -------------------------------
n = 60
t0 = time.time()
e60, _ = dmrg_mod.dmrg(dmrg_mod.xxz_mpo(n, delta=1.0), chi=32, sweeps=4)
# Bethe-ansatz thermodynamic limit: e/site -> 1/4 - ln 2 ~ -0.4431 (times 4
# in our convention H = sum XX+YY+ZZ)
per_site = float(e60) / (n - 1)
print(f"n={n}: E = {float(e60):.4f} ({time.time()-t0:.1f} s), "
      f"e/bond = {per_site:.4f} (Bethe bulk: {4*(0.25-np.log(2)):.4f})")
assert abs(per_site - 4 * (0.25 - np.log(2))) < 0.05
print("DMRG scales past dense diagonalization with bulk-correct energy")
