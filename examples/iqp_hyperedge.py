"""IQP circuits through hyperedge diagonal gates (reference
``examples/iqp_circuit_hyperedge.py`` role).

Instantaneous Quantum Polynomial circuits are H . D(theta) . H with D a
diagonal of Z-monomial phases.  The diagonal block lowers to HYPEREDGES in
the einsum IR (``rzm`` k-local Z rotations share one index per hyperedge
instead of materializing 2^k gate tensors), which is what keeps wide IQP
instances contractible.

Self-validating checks (n=10, random degree-3 IQP instances):

1. CLOSED FORM: <0|C|0> equals the exact character sum
   2^-n sum_x exp(i sum_S theta_S prod_{j in S} (-1)^{x_j})
   evaluated by brute-force enumeration — checked for 5 random instances
   to 1e-5 (this IS the IQP<->Ising-partition-function correspondence,
   imaginary temperature).
2. ARBITRARY amplitudes: c.amplitude(b) matches the dense-state oracle on
   32 random bitstrings.
3. Anticoncentration: the output collision probability sum_b p(b)^2 of a
   random instance lies within [1, 4] x 2 / 2^n (the random-IQP
   Porter-Thomas band), while a trivial instance (theta=0) is maximally
   concentrated.
4. jit+grad: the probability of returning to |0..0> is differentiable
   w.r.t. all phase weights; gradient matches finite differences.

Reference behavior anchors: rzm/cmz hyperedge lowering
(``tensorcircuit/ir`` + ``cons.py`` hyperedge role), ``examples/
iqp_circuit_hyperedge.py``.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc

N = 10


def random_instance(rng, nterms=25):
    """Random Z-monomials of degree 1..3 with uniform phases."""
    terms = []
    for _ in range(nterms):
        k = int(rng.integers(1, 4))
        sites = tuple(sorted(rng.choice(N, size=k, replace=False).tolist()))
        terms.append(sites)
    thetas = rng.uniform(-np.pi, np.pi, len(terms)).astype(np.float32)
    return terms, thetas


def build(terms, thetas):
    c = tc.Circuit(N)
    for i in range(N):
        c.h(i)
    for sites, th in zip(terms, thetas):
        c.rzm(*sites, theta=th)  # k-local Z rotation -> one hyperedge
    for i in range(N):
        c.h(i)
    return c


def character_sum(terms, thetas):
    """2^-n sum_x prod_S e^{-i theta_S/2 * (-1)^{x.S}} (rzm convention)."""
    xs = np.arange(2**N)
    bits = (xs[:, None] >> (N - 1 - np.arange(N))[None, :]) & 1
    total = np.ones(2**N, dtype=np.complex128)
    for sites, th in zip(terms, thetas):
        par = np.bitwise_xor.reduce(bits[:, list(sites)], axis=1)
        sign = 1.0 - 2.0 * par
        total *= np.exp(-0.5j * float(th) * sign)
    return total.mean()


if __name__ == "__main__":
    rng = np.random.default_rng(0)

    # [1] closed form on 5 instances
    worst = 0.0
    for _ in range(5):
        terms, thetas = random_instance(rng)
        c = build(terms, thetas)
        amp = complex(np.asarray(c.amplitude("0" * N)))
        ref = character_sum(terms, thetas)
        worst = max(worst, abs(amp - ref))
    print(f"[1] <0|C|0> vs Ising character sum, 5 instances: max |d| = {worst:.2e}")
    assert worst < 1e-5

    # [2] arbitrary amplitudes vs the dense state
    terms, thetas = random_instance(rng)
    c = build(terms, thetas)
    psi = np.asarray(c.state()).reshape(-1)
    errs = []
    for _ in range(32):
        b = rng.integers(0, 2**N)
        bstr = format(b, f"0{N}b")
        errs.append(abs(complex(np.asarray(c.amplitude(bstr))) - psi[b]))
    print(f"[2] 32 random amplitudes vs dense state: max |d| = {max(errs):.2e}")
    assert max(errs) < 1e-5

    # [3] anticoncentration of the output distribution
    p = np.abs(psi) ** 2
    coll = float((p**2).sum())
    band = 2.0 / 2**N
    c0 = build(terms, np.zeros_like(thetas))
    p0 = np.abs(np.asarray(c0.state()).reshape(-1)) ** 2
    print(
        f"[3] collision probability: random {coll:.2e} in [{band:.2e}, {4 * band:.2e}];"
        f" trivial instance {float((p0**2).sum()):.3f}"
    )
    assert band <= coll <= 4 * band
    assert float((p0**2).sum()) > 0.99  # theta=0 -> identity -> all mass on |0>

    # [4] jit + grad through the hyperedge phases
    tvec = jnp.asarray(thetas)

    def p_return(tv):
        cc = build(terms, tv)
        return jnp.abs(cc.amplitude("0" * N)) ** 2

    f = jax.jit(p_return)
    g = jax.jit(jax.grad(p_return))(tvec)
    eps = 1e-2
    k = 7
    fd = (float(f(tvec.at[k].add(eps))) - float(f(tvec.at[k].add(-eps)))) / (2 * eps)
    print(f"[4] d p(0)/d theta_{k}: AD {float(g[k]):+.6f} vs FD {fd:+.6f}")
    assert abs(float(g[k]) - fd) < 5e-4
    print("OK: IQP hyperedge circuits match the character-sum oracle and are fully differentiable")
