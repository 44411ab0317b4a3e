"""Quantum signal processing: Chebyshev response + phase fitting
(reference ``examples/qsp.py`` role).

QSP in the Wx convention: the signal operator ``W(x) = [[x, i s],[i s, x]]``
(``s = sqrt(1-x^2)``) interleaved with ``rz`` phase rotations produces
``<0|U_phi(x)|0> = P(x)``, a degree-d polynomial in x.  Two checks:

1. With all phases zero, ``P(x) = T_d(x)`` (Chebyshev) EXACTLY — a closed
   form the circuit must reproduce at every x.
2. Fitting the phases with optax recovers a target odd degree-3 polynomial
   to high accuracy across the whole interval.

Everything runs through the public ``tc.Circuit`` gate surface (rz + exp of
the signal unitary via ``unitary``), jitted and vmapped over x.
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


def qsp_value(phases, x):
    """<0|U_phi(x)|0> for the phase list ``phases`` (degree = len-1)."""
    c = tc.Circuit(1)
    s = jnp.sqrt(jnp.clip(1.0 - x * x, 0.0, 1.0))
    w = jnp.array([[x, 1j * s], [1j * s, x]], dtype=jnp.complex64)
    c.rz(0, theta=-2.0 * phases[0])
    for k in range(1, phases.shape[0]):
        c.unitary(0, unitary=w, name="W(x)")
        c.rz(0, theta=-2.0 * phases[k])
    return c.amplitude("0")


qsp_grid = jax.jit(jax.vmap(qsp_value, in_axes=(None, 0)))

xs = jnp.linspace(-0.98, 0.98, 41, dtype=jnp.float32)

# --- check 1: zero phases give the Chebyshev polynomial T_d(x) exactly ---
for d in (2, 3, 5):
    phases0 = jnp.zeros(d + 1, dtype=jnp.float32)
    vals = np.real(np.asarray(qsp_grid(phases0, xs)))
    cheb = np.cos(d * np.arccos(np.asarray(xs)))
    err = np.abs(vals - cheb).max()
    print(f"degree {d}: max |P(x) - T_{d}(x)| = {err:.2e}")
    assert err < 5e-6

# --- check 2: fit phases to a target odd polynomial ---
target = lambda x: 0.6 * x**3 - 0.4 * x  # odd, degree 3, |p|<=1 on [-1,1]


def loss(phases):
    p = jnp.real(qsp_grid(phases, xs))
    return jnp.mean((p - target(xs)) ** 2)


phases = jnp.asarray(np.random.default_rng(3).normal(size=4) * 0.1, jnp.float32)
opt = optax.adam(0.05)
state = opt.init(phases)
vg = jax.jit(jax.value_and_grad(loss))
for i in range(400):
    v, g = vg(phases)
    upd, state = opt.update(g, state)
    phases = optax.apply_updates(phases, upd)
final = float(loss(phases))
resid = float(
    jnp.abs(jnp.real(qsp_grid(phases, xs)) - target(xs)).max()
)
print(f"fit: mse {final:.3e}, max residual {resid:.3e}")
assert resid < 5e-3
print("QSP: Chebyshev closed form exact, degree-3 odd target fitted")
