"""SymbolCircuit -> sympy -> lambdify -> JAX: symbolic expectation
expressions lifted into jit/grad/vmap-able numerical functions (reference
``examples/lambdify_jax_symbolcircuit.py`` role).

Workflow demonstrated end to end on a 3-qubit two-parameter ansatz:

1. Build a ``tc.SymbolCircuit`` with sympy symbols (declared ``real=True``
   so conjugate(sin(theta)) resolves and the energy expression is real).
2. ``expectation_ps`` returns a closed-form sympy expression for
   <Z0 Z1> + <Y2>; print it — it is the exact trigonometric polynomial.
3. ``sympy.lambdify(..., modules="jax")`` turns the expression into a JAX
   function that composes with ``jax.jit``, ``jax.grad`` and ``jax.vmap``.

Self-validating checks:

- the lambdified value matches the numeric ``tc.Circuit`` built by
  ``to_circuit`` on a parameter grid (exact symbolic vs f32 numeric),
- ``jax.grad`` of the lambdified energy matches autodiff through the
  numeric circuit,
- a vmapped 64-point parameter batch matches pointwise evaluation,
- the closed form itself is verified against the hand-derived
  cos(a) - cos(a+b) sin(b) by random substitution.

Reference behavior anchor: ``tensorcircuit/symbolcircuit.py`` (48-652).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import sympy as sp
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc

a, b = sp.symbols("a b", real=True)


def build_symbolic():
    c = tc.SymbolCircuit(3)
    c.h(0)
    c.ry(1, theta=a)
    c.cnot(0, 1)
    c.rx(2, theta=b)
    c.rzz(1, 2, theta=a + b)
    return c


def energy_expr(c):
    return sp.simplify(c.expectation_ps(z=[0, 1]) + c.expectation_ps(y=[2]))


def numeric_energy(av, bv):
    c = tc.Circuit(3)
    c.h(0)
    c.ry(1, theta=av)
    c.cnot(0, 1)
    c.rx(2, theta=bv)
    c.rzz(1, 2, theta=av + bv)
    return jnp.real(c.expectation_ps(z=[0, 1]) + c.expectation_ps(y=[2]))


if __name__ == "__main__":
    sc = build_symbolic()
    expr = energy_expr(sc)
    assert not expr.has(sp.conjugate), expr
    print(f"symbolic <Z0Z1> + <Y2> = {expr}")

    f = sp.lambdify((a, b), expr, modules="jax")
    jf = jax.jit(f)

    # [1] value parity vs the numeric circuit on a grid
    worst = 0.0
    for av in np.linspace(-2, 2, 5):
        for bv in np.linspace(-1.5, 1.5, 5):
            v_sym = float(jf(jnp.float32(av), jnp.float32(bv)))
            v_num = float(numeric_energy(jnp.float32(av), jnp.float32(bv)))
            worst = max(worst, abs(v_sym - v_num))
    print(f"[1] lambdified-vs-numeric on 25-point grid: max |dE| = {worst:.2e}")
    assert worst < 2e-5

    # [2] grad parity
    g_sym = jax.grad(lambda p: f(p[0], p[1]))(jnp.array([0.37, -0.82]))
    g_num = jax.grad(lambda p: numeric_energy(p[0], p[1]))(
        jnp.array([0.37, -0.82], dtype=jnp.float32)
    )
    gd = float(jnp.max(jnp.abs(g_sym - g_num)))
    print(f"[2] grad(lambdified) vs autodiff(numeric): max |dg| = {gd:.2e}")
    assert gd < 2e-5

    # [3] vmap over a parameter batch
    batch = jnp.asarray(np.random.default_rng(0).uniform(-2, 2, (64, 2)), jnp.float32)
    vf = jax.jit(jax.vmap(lambda p: f(p[0], p[1])))
    vals = np.asarray(vf(batch))
    point = np.array([float(jf(p[0], p[1])) for p in batch])
    assert np.max(np.abs(vals - point)) < 1e-6
    print(f"[3] vmap batch of 64: matches pointwise, spread = [{vals.min():.3f}, {vals.max():.3f}]")

    # [4] the closed form, derived by hand: rzz commutes with Z0 Z1, and the
    # branch average over q0 gives <Z0 Z1> = cos(a); the rzz(a+b) rotation
    # maps Y2 -> cos(a+b) Y2 + sin(a+b) Z1 X2 with <Z1> = 0 and
    # <Y2> = -sin(b) after rx(b), so <Y2> = -cos(a+b) sin(b).
    expr2 = sp.simplify(expr - (sp.cos(a) - sp.cos(a + b) * sp.sin(b)))
    subs_check = [
        complex(expr2.subs({a: av, b: bv}).evalf())
        for av, bv in [(0.3, 0.5), (1.1, -0.7), (-2.0, 0.9)]
    ]
    # gate constants are f32 (e.g. 1/sqrt2**2 = 0.99999997), not exact
    assert max(abs(v) for v in subs_check) < 1e-6, (expr, subs_check)
    print("[4] closed form equals cos(a) - cos(a+b)sin(b) (derived by hand)")

    print("OK: SymbolCircuit expressions lambdify into jit/grad/vmap-able JAX functions")
