"""Four textbook algorithms, each verified against its exact guarantee.

Reference role: the framework-demo family every circuit library ships —
teleportation, Deutsch-Jozsa, Bernstein-Vazirani, and quantum phase
estimation — built from the public gate/measure/template surface:

  1. teleportation: all four Bell-measurement branches post-selected and
     corrected; the receiver's reduced state matches the (random) input
     state to 1e-6 in every branch;
  2. Deutsch-Jozsa (n = 4): the all-zero outcome has probability exactly
     1 for constant oracles and exactly 0 for balanced ones;
  3. Bernstein-Vazirani: one query recovers a hidden 6-bit string with
     certainty (the full output distribution is a point mass);
  4. QPE with t = 6 ancillas on a rz eigenphase: the argmax readout is
     the best t-bit approximation of the phase, and for an exactly
     representable phase the distribution is a point mass.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu.templates import blocks

tc.set_backend("jax")

# ---- 1. teleportation ---------------------------------------------------
theta, phi = 0.7, 1.9  # the state to teleport: ry(theta) rz(phi) |0>
ref = tc.Circuit(1)
ref.ry(0, theta=theta)
ref.rz(0, theta=phi)
target = np.asarray(ref.state())

for m0 in (0, 1):
    for m1 in (0, 1):
        c = tc.Circuit(3)
        c.ry(0, theta=theta)
        c.rz(0, theta=phi)
        c.h(1)
        c.cnot(1, 2)        # Bell pair shared between sender and receiver
        c.cnot(0, 1)
        c.h(0)              # Bell measurement basis
        c.post_select(0, keep=m0)
        c.post_select(1, keep=m1)
        if m1:
            c.x(2)          # classical corrections
        if m0:
            c.z(2)
        psi = np.asarray(c.state()).reshape(2, 2, 2)[m0, m1]
        psi = psi / np.linalg.norm(psi)
        fid = abs(np.vdot(target, psi)) ** 2
        assert abs(fid - 1.0) < 1e-6, (m0, m1, fid)
print("1. teleportation: fidelity 1 in all four branches")

# ---- 2. Deutsch-Jozsa ---------------------------------------------------
n = 4


def dj_probability_zero(oracle):
    """P(all-zero) after the DJ circuit with the given oracle appender."""
    c = tc.Circuit(n + 1)
    c.x(n)
    for i in range(n + 1):
        c.h(i)
    oracle(c)
    for i in range(n):
        c.h(i)
    p = np.asarray(jnp.real(c.probability())).reshape((2,) * (n + 1)).sum(axis=-1)
    return float(p.reshape(-1)[0])


constant = lambda c: None                       # f == 0
constant1 = lambda c: c.x(n)                    # f == 1
balanced = lambda c: c.cnot(0, n)               # f = x_0
balanced2 = lambda c: [c.cnot(i, n) for i in range(n)]  # f = parity

assert abs(dj_probability_zero(constant) - 1.0) < 1e-6
assert abs(dj_probability_zero(constant1) - 1.0) < 1e-6
assert dj_probability_zero(balanced) < 1e-9
assert dj_probability_zero(balanced2) < 1e-9
print("2. Deutsch-Jozsa: constant vs balanced separated with certainty")

# ---- 3. Bernstein-Vazirani ----------------------------------------------
nb = 6
secret = [1, 0, 1, 1, 0, 1]
c = tc.Circuit(nb + 1)
c.x(nb)
for i in range(nb + 1):
    c.h(i)
for i, s in enumerate(secret):
    if s:
        c.cnot(i, nb)
for i in range(nb):
    c.h(i)
p = np.asarray(jnp.real(c.probability())).reshape((2,) * (nb + 1)).sum(axis=-1)
idx = int(np.argmax(p.reshape(-1)))
bits = [int(b) for b in np.binary_repr(idx, width=nb)]
assert bits == secret and abs(p.reshape(-1)[idx] - 1.0) < 1e-6
print(f"3. Bernstein-Vazirani: recovered {bits} in one query")

# ---- 4. quantum phase estimation ----------------------------------------
t = 6
phase = 13 / 64  # exactly representable with t = 6 bits


def qpe_distribution(phase):
    c = tc.Circuit(t + 1)
    c.x(t)  # eigenstate |1> of rz
    for i in range(t):
        c.h(i)
    for i in range(t):
        # controlled-U^(2^i) with U|1> = e^{2 pi i phase}|1>: a cphase
        c.cphase(i, t, theta=2 * np.pi * phase * (2 ** (t - 1 - i)))
    blocks.qft(c, *range(t), inverse=True)
    p = np.asarray(jnp.real(c.probability())).reshape((2,) * (t + 1)).sum(axis=-1)
    return p.reshape(-1)


p = qpe_distribution(phase)
est = int(np.argmax(p)) / 2**t
print(f"4. QPE: phase {phase:.6f} estimated as {est:.6f} "
      f"(P = {p.max():.4f})")
assert est == phase and abs(p.max() - 1.0) < 1e-6

# a non-representable phase still rounds to the nearest t-bit fraction
p2 = qpe_distribution(0.3)
est2 = int(np.argmax(p2)) / 2**t
assert abs(est2 - 0.3) <= 0.5 / 2**t + 1e-12
print("OK")
