"""Chaos diagnostics: frame potential, Page entropy, OTOC light cone.

Reference examples chaotic_behavior.py role, with every quantity validated
against a known closed form:

- the 1st/2nd frame potentials of a deep random-parameter ansatz ensemble
  match the Haar values F_t = t!/d^t (F1 = 1/d, F2 = 2/d^2);
- the half-chain entanglement of deep random states hits the Page value
  S = (n/2) ln 2 - 1/2;
- OTOCs F_j(t) = <W_0(t) Z_j W_0(t) Z_j> show a ballistic light cone under
  a kicked-Ising Floquet: outside the cone F ~= 1, inside it decays;
  the integrable point (no transverse kick) keeps |F| high where the
  chaotic point has scrambled.

Everything is jit + vmap (ensemble axis), statevector engine.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu import quantum as qu

n, nlayers = 8, 16
d = 2**n


def random_state(params):
    c = tc.Circuit(n)
    for l in range(nlayers):
        for j in range(n):
            c.ry(j, theta=params[l, j])
        for j in range(n):
            c.cnot(j, (j + 1) % n)
    return c.state()


def frame_potentials(seed=0, batch=24):
    rng = np.random.default_rng(seed)
    p1 = jnp.asarray(rng.uniform(0, 2 * np.pi, size=(batch, nlayers, n)), jnp.float32)
    p2 = jnp.asarray(rng.uniform(0, 2 * np.pi, size=(batch, nlayers, n)), jnp.float32)

    @jax.jit
    def overlaps(a, b):
        sa = jax.vmap(random_state)(a)
        sb = jax.vmap(random_state)(b)
        return jnp.abs(jnp.einsum("bi,bi->b", jnp.conj(sa), sb)) ** 2

    o2 = np.asarray(overlaps(p1, p2))
    return float(np.mean(o2)), float(np.mean(o2**2))


def page_entropy(seed=3, batch=8):
    rng = np.random.default_rng(seed)
    ps = jnp.asarray(rng.uniform(0, 2 * np.pi, size=(batch, nlayers, n)), jnp.float32)

    @jax.jit
    def ent(p):
        s = random_state(p)
        rho = qu.reduced_density_matrix(s, cut=n // 2)
        return qu.entropy(rho)

    return float(np.mean([float(ent(ps[b])) for b in range(batch)]))


def kicked_ising_u(c, steps, hx):
    """Floquet kicked Ising: ZZ bonds + Z field, then X kick."""
    for _ in range(steps):
        for j in range(n - 1):
            c.rzz(j, j + 1, theta=1.2)
        for j in range(n):
            c.rz(j, theta=0.8)
        for j in range(n):
            c.rx(j, theta=hx)
    return c


def otoc_row(steps, hx):
    """F_j = <psi| W(t) Z_j W(t) Z_j |psi>, W = Z_0, |psi> = |+...+>.

    Built as <y|x> with x = W(t) Z_j |psi>, y = Z_j W(t) |psi>,
    W(t) = U^dag Z_0 U via circuit composition + inverse replay.
    """

    def w_t(inputs):
        cu = kicked_ising_u(tc.Circuit(n, inputs=inputs), steps, hx)
        mid = cu.state()
        cm = tc.Circuit(n, inputs=mid)
        cm.z(0)
        cui = kicked_ising_u(tc.Circuit(n), steps, hx).inverse()
        cb = tc.Circuit(n, inputs=cm.state())
        cb.append(cui)
        return cb.state()

    @jax.jit
    def row():
        c0 = tc.Circuit(n)
        c0.h_layer()
        psi = c0.state()
        out = []
        for j in range(n):
            cj = tc.Circuit(n, inputs=psi)
            cj.z(j)
            x = w_t(cj.state())
            y = w_t(psi)
            cy = tc.Circuit(n, inputs=y)
            cy.z(j)
            out.append(jnp.vdot(cy.state(), x))
        return jnp.stack(out)

    return np.asarray(row())


def main():
    f1, f2 = frame_potentials()
    print(f"frame potentials: F1={f1:.2e} (Haar {1/d:.2e}), "
          f"F2={f2:.2e} (Haar {2/d**2:.2e})")
    assert abs(f1 - 1 / d) < 3 / d, f1       # ~sqrt(batch) statistics
    assert f2 < 20 / d**2                    # far from product-state 1.0

    s_half = page_entropy()
    s_page = (n / 2) * np.log(2) - 0.5
    print(f"half-chain entropy {s_half:.4f} vs Page {s_page:.4f}")
    assert abs(s_half - s_page) < 0.25

    # OTOC light cone at small t: far operators still commute
    row_early = otoc_row(steps=2, hx=0.9)
    row_late = otoc_row(steps=8, hx=0.9)
    row_free = otoc_row(steps=8, hx=0.0)  # integrable point: no scrambling
    print("|F_j| early :", np.round(np.abs(row_early), 3))
    print("|F_j| late  :", np.round(np.abs(row_late), 3))
    print("|F_j| free  :", np.round(np.abs(row_free), 3))
    assert np.abs(row_early[n - 1]) > 0.99      # outside the cone: F ~= 1
    assert np.abs(row_early[1]) < 0.9           # inside the cone: decayed
    # chaotic at t=8: sites the front has passed are scrambled, and the
    # front is ordered (the last site is still the least affected)
    assert np.mean(np.abs(row_late[: n // 2])) < 0.4
    assert np.abs(row_late[n - 1]) > np.abs(row_late[n // 2])
    assert np.mean(np.abs(row_free)) > 0.9      # integrable: not scrambled
    print("OK")


if __name__ == "__main__":
    main()
