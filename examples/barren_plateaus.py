"""Barren plateaus: gradient variance decays exponentially with width.

Reference examples bp_benchmark.py / bp_validation.py role (physics:
McClean et al., arXiv 1803.11173).  For parameter ensembles whose circuit
approaches a 2-design on both sides of the differentiated gate, the
variance of dE/dtheta for a traceless cost O scales as

    Var ~ tr(O^2) / 4^n     (up to O(1) factors),

so a LOCAL cost like O = Z_0 Z_1 (tr O^2 = 2^n) gives Var ~ 2^-n: decay
exponent ln 2 per qubit.  (The 4^-n folklore number applies to global
rank-1-style costs where tr(O^2) = O(1).)

Ansatz: layers of per-site RZ(a) RY(b) + a CZ ring — generic SU(2) per
site per layer; the probed parameter sits at the MIDDLE layer so both
sides scramble (a first-layer parameter sees the unscrambled |0...0> and
decays differently).  Depth rides `experimental.scan_circuit_layers` so
the XLA program stays layer-sized — unrolled deep AD programs take
minutes to compile on CPU and OOM the TPU compile helper (CLAUDE.md).

Self-validating: the fitted decay exponent matches ln 2 within fit
tolerance at depth 4n+1, and the variance is depth-stable past
thermalization.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu import experimental


def grad_variance(n, nlayers, batch=96, seed=0):
    """Var over random params of dE/d(middle-layer RY angle at site 0)."""

    def layer(c, p):
        for j in range(n):
            c.rz(j, theta=p[0, j])
        for j in range(n):
            c.ry(j, theta=p[1, j])
        for j in range(n):
            c.cz(j, (j + 1) % n)

    def energy(params):
        c0 = tc.Circuit(n)
        c = experimental.scan_circuit_layers(c0, layer, params)
        return jnp.real(c.expectation_ps(z=[0, 1]))

    rng = np.random.default_rng(seed)
    ps = jnp.asarray(
        rng.uniform(0, 2 * np.pi, size=(batch, nlayers, 2, n)), jnp.float32
    )
    gfn = jax.jit(jax.vmap(jax.grad(energy)))
    gs = np.asarray(gfn(ps))[:, nlayers // 2, 1, 0]  # middle-layer RY, site 0
    return float(np.var(gs))


def main():
    ns = [6, 8, 10]
    vs = [grad_variance(n, nlayers=4 * n + 1) for n in ns]
    for n, v in zip(ns, vs):
        print(f"n={n:2d}: Var[dE/dtheta] = {v:.3e}")
    # exponential fit: log V = a - b n; local-cost 2-design prediction ln 2
    b, a = np.polyfit(ns, -np.log(vs), 1)[:2]
    print(f"fitted decay: Var ~ exp(-{b:.3f} n)  (local-cost 2-design: "
          f"ln 2 = {np.log(2):.3f})")
    assert 0.75 * np.log(2) < b < 1.3 * np.log(2), b
    # depth saturation at fixed n: past thermalization the variance is flat
    v_depth = [grad_variance(8, nlayers=d, seed=1) for d in (17, 33)]
    ratio = v_depth[1] / v_depth[0]
    print(f"n=8 depth 17 vs 33: ratio {ratio:.2f} (flat ~= 1)")
    assert 0.4 < ratio < 2.5, ratio
    print("OK")


if __name__ == "__main__":
    main()
