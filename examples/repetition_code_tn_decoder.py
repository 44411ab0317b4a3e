"""Tensor-network maximum-likelihood decoding of a repetition code with
INHOMOGENEOUS noise (reference ``examples/surface_code_dem_tn_decoder.py``
role, on the chain code where the TN contraction is exact and fast).

For the distance-d bit-flip repetition code with per-qubit error rates
p_i, the coset probabilities

    P(class L | syndrome s) ~ sum_{e : syndrome(e) = s, logical(e) = L} prod_i p_i^{e_i}(1-p_i)^{1-e_i}

factorize as a 1D tensor network: a transfer-matrix scan over qubits with
a 2-state "running parity vs syndrome" index — contraction is O(d), the
same structural trick the surface-code decoder uses on the 2D DEM (there
with bond dimension, here exact).  The whole decoder (all syndromes of a
Monte-Carlo batch) runs as one jitted lax.scan + vmap program.

Self-validating checks (d=11):

1. EXACTNESS: TN coset probabilities equal brute-force enumeration over
   all 2^11 error patterns for 20 random syndromes (rel err < 1e-10).
2. ML vs MAJORITY: with strongly inhomogeneous noise (p_i in [0.01,
   0.35]), the ML decoder's logical error rate over 4000 Monte-Carlo
   shots is LOWER than majority vote's (for uniform noise they coincide;
   inhomogeneity is exactly where weighted decoding pays).
3. CALIBRATION: the decoder's average predicted confidence matches its
   empirical success rate within 2.5 points (a proper posterior).
4. Uniform-noise control: ML and majority decisions agree on every
   syndrome when p_i = const.

Reference behavior anchor: ``examples/surface_code_dem_tn_decoder.py``
(DEM -> TN ML decoding), repo ``models/detectors.py`` machinery.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from jax import lax

D = 11


def coset_probs_tn(ps, syndrome):
    """P(e ends in parity b | syndrome) via transfer-matrix scan.

    State: running cumulative-parity c in {0,1} relative to qubit 0's
    error value e_0; syndrome bit s_i fixes e_i XOR e_{i+1}.
    Returns (P[logical=e_0=0 branch], P[e_0=1 branch]) unnormalized.
    """
    # branch on e_0; then e_{i+1} = e_i XOR s_i is DETERMINED: the
    # repetition-code syndrome fixes the full pattern up to one bit.
    def weight(e0):
        def step(carry, inp):
            e_prev, logw = carry
            s, p = inp
            e = jnp.logical_xor(e_prev, s)
            logw = logw + jnp.where(e, jnp.log(p), jnp.log1p(-p))
            return (e, logw), e

        p0 = ps[0]
        init = (jnp.asarray(e0, bool), jnp.where(e0, jnp.log(p0), jnp.log1p(-p0)))
        (e_last, logw), es = lax.scan(step, init, (syndrome.astype(bool), ps[1:]))
        # logical class = majority... for decoding we label the class by
        # e_0 (the two cosets differ by the all-ones logical)
        return logw

    return jnp.exp(weight(0)), jnp.exp(weight(1))


def brute_force(ps, syndrome):
    d = len(ps)
    tot = [0.0, 0.0]
    for e in range(2**d):
        bits = [(e >> i) & 1 for i in range(d)]
        syn = [bits[i] ^ bits[i + 1] for i in range(d - 1)]
        if syn != list(syndrome):
            continue
        w = np.prod([ps[i] if bits[i] else 1 - ps[i] for i in range(d)])
        tot[bits[0]] += w
    return tot


def decode_batch(ps, syndromes):
    f = jax.jit(jax.vmap(lambda s: jnp.stack(coset_probs_tn(ps, s))))
    w = np.asarray(f(syndromes))
    return w  # (batch, 2): weight of e0=0 and e0=1 cosets


if __name__ == "__main__":
    rng = np.random.default_rng(0)
    ps = jnp.asarray(rng.uniform(0.01, 0.35, D))

    # [1] exactness vs enumeration
    worst = 0.0
    for _ in range(20):
        s = rng.integers(0, 2, D - 1)
        tn = np.array(jax.jit(lambda ss: jnp.stack(coset_probs_tn(ps, ss)))(jnp.asarray(s)))
        bf = np.array(brute_force(np.asarray(ps), list(s)))
        worst = max(worst, float(np.abs(tn - bf).max() / bf.max()))
    print(f"[1] TN coset probabilities vs 2^{D} enumeration: max rel err = {worst:.2e}")
    assert worst < 1e-10

    # Monte-Carlo decoding experiment
    shots = 4000
    errors = (rng.random((shots, D)) < np.asarray(ps)[None, :]).astype(np.int64)
    syndromes = jnp.asarray(errors[:, :-1] ^ errors[:, 1:])
    w = decode_batch(ps, syndromes)
    # decoded e_0; full pattern follows from the syndrome; correction
    # succeeds iff decoded e_0 == true e_0 (same coset)
    ml_guess = (w[:, 1] > w[:, 0]).astype(np.int64)
    ml_fail = float((ml_guess != errors[:, 0]).mean())
    # majority vote: flip iff the syndrome-consistent pattern with e0=0
    # has weight > d/2 (equivalently decode the coset with fewer flips)
    pattern0 = np.cumsum(np.concatenate([np.zeros((shots, 1), np.int64), np.asarray(syndromes)], 1), axis=1) % 2
    nflips0 = pattern0.sum(1)
    maj_guess = (nflips0 > D / 2).astype(np.int64)
    maj_fail = float((maj_guess != errors[:, 0]).mean())
    print(f"[2] logical error rate: ML {ml_fail:.4f} < majority {maj_fail:.4f} (inhomogeneous noise)")
    assert ml_fail < maj_fail

    # [3] calibration of the posterior
    conf = np.max(w, axis=1) / np.sum(w, axis=1)
    success = (ml_guess == errors[:, 0]).astype(float)
    print(f"[3] mean predicted confidence {conf.mean():.4f} vs empirical success {success.mean():.4f}")
    assert abs(conf.mean() - success.mean()) < 0.025

    # [4] uniform-noise control: ML == majority
    pu = jnp.full(D, 0.12)
    wu = decode_batch(pu, syndromes)
    mlu = (wu[:, 1] > wu[:, 0]).astype(np.int64)
    agree = float((mlu == maj_guess).mean())
    print(f"[4] uniform noise: ML agrees with majority on {agree:.2%} of syndromes")
    assert agree == 1.0
    print("OK: exact TN maximum-likelihood decoding beats majority vote under inhomogeneous noise")
