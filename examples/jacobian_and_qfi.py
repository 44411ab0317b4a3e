"""State Jacobians (jacfwd vs jacrev), the quantum Fisher information,
and the quantum natural gradient (reference ``examples/jacobian_cal.py``
and ``quantumng.py`` roles).

For an n=6, 18-parameter ansatz |psi(p)>:

- jac[k] = d|psi>/dp_k computed BOTH ways: ``jax.jacfwd`` (forward-mode
  through the complex state, one pass per parameter-column) and
  ``jax.jacrev`` on the stacked (Re, Im) planes (reverse-mode; complex
  outputs need the real-plane trick on this hardware — CLAUDE.md axon
  complex rule),
- QFI  g_ij = 4 Re[ <d_i psi|d_j psi> - <d_i psi|psi><psi|d_j psi> ],
- the QNG step solve(g + eps I, grad E) compared against
  ``experimental.qng`` (the production implementation).

Self-validating checks:

1. jacfwd == jacrev(real-planes) column by column (< 1e-5).
2. QFI from the Jacobian == experimental.qng's metric (< 1e-4), is
   symmetric PSD, and for the FIRST-layer rx parameters (acting on |0>)
   reproduces the known single-qubit value g_ii = 1 (variance of the
   generator Z .. wait, of X/2 on |0>: 4 * Var(X/2) = 1).
3. The defining QNG property — invariance under reparametrization
   (p -> 2p leaves the natural-gradient state update unchanged while the
   plain gradient step shrinks 4x).

Reference behavior anchors: ``tensorcircuit/experimental.py`` qng,
``examples/jacobian_cal.py``.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu import experimental as E

N, NLAYERS = 6, 3
NP = NLAYERS * N


def state(params):
    c = tc.Circuit(N)
    p = params.reshape(NLAYERS, N)
    for l in range(NLAYERS):
        for i in range(N):
            c.rx(i, theta=p[l, i])
        if l < NLAYERS - 1:
            for i in range(N - 1):
                c.cnot(i, i + 1)
    return c.state()


def energy(params):
    c = tc.Circuit(N, inputs=state(params))
    e = sum(jnp.real(c.expectation_ps(z=[i, i + 1])) for i in range(N - 1))
    return e - 0.5 * sum(jnp.real(c.expectation_ps(x=[i])) for i in range(N))


def qfi_from_jac(jac, psi):
    # jac: (dim, np) complex; QFI_ij = 4 Re[<di|dj> - <di|psi><psi|dj>]
    ov = jnp.conj(jac.T) @ jac
    a = jnp.conj(jac.T) @ psi
    return 4.0 * jnp.real(ov - jnp.outer(a, jnp.conj(a)))


if __name__ == "__main__":
    rng = np.random.default_rng(0)
    p0 = jnp.asarray(rng.normal(scale=0.4, size=NP), jnp.float32)

    # [1] jacfwd vs jacrev on real planes
    jf = jax.jacfwd(state)(p0)  # (dim, np) complex
    planes = jax.jacrev(lambda p: jnp.stack([jnp.real(state(p)), jnp.imag(state(p))]))(p0)
    jr = planes[0] + 1j * planes[1]
    d = float(jnp.max(jnp.abs(jf - jr)))
    print(f"[1] jacfwd vs jacrev(Re/Im planes): max |d| = {d:.2e}")
    assert d < 1e-5

    # [2] QFI: jacobian formula vs experimental.qng
    psi = state(p0)
    g_jac = qfi_from_jac(jf, psi)
    g_qng = E.qng(state)(p0)
    dq = float(jnp.max(jnp.abs(g_jac - g_qng)))
    sym = float(jnp.max(jnp.abs(g_jac - g_jac.T)))
    evs = np.linalg.eigvalsh(np.asarray(g_jac, dtype=np.float64))
    # first-layer rx on |0>: generator X/2, 4 Var = 4(1/4 - 0) = 1
    diag_first = np.asarray(jnp.diag(g_jac))[:N]
    print(
        f"[2] QFI: |jac-formula - qng| = {dq:.2e}, asym = {sym:.1e}, "
        f"min eig = {evs.min():.2e}, first-layer diag = {diag_first.round(5)}"
    )
    assert dq < 1e-4
    assert sym < 1e-5 and evs.min() > -1e-5
    assert np.allclose(diag_first, 1.0, atol=1e-5)

    # [3] the defining property: QNG is invariant under reparametrization.
    # With q = 2p (state2(q) = state(q/2)) the natural-gradient state update
    # is IDENTICAL, while the plain gradient step shrinks by 4x.
    lr, eps = 0.1, 1e-6
    grad = jax.grad(energy)(p0)
    nat = jnp.linalg.solve(g_qng + eps * jnp.eye(NP), grad)
    e_nat = float(energy(p0 - lr * nat))

    energy2 = lambda q: energy(q / 2.0)
    q0 = 2.0 * p0
    grad2 = jax.grad(energy2)(q0)
    g2 = E.qng(lambda q: state(q / 2.0))(q0)
    nat2 = jnp.linalg.solve(g2 + eps * jnp.eye(NP), grad2)
    e_nat2 = float(energy2(q0 - lr * nat2))
    e_plain = float(energy(p0 - lr * grad))
    e_plain2 = float(energy2(q0 - lr * grad2))
    print(
        f"[3] QNG step energy: original {e_nat:.6f} == reparam {e_nat2:.6f}; "
        f"plain step: {e_plain:.6f} != reparam {e_plain2:.6f}"
    )
    assert abs(e_nat - e_nat2) < 1e-3  # invariant (up to eps regularization)
    assert abs(e_plain - e_plain2) > 1e-2  # plain GD is coordinate-dependent
    print("OK: jacfwd==jacrev, QFI matches experimental.qng, QNG is reparametrization-invariant")
