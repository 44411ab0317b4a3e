"""QAOA for weighted MaxCut through the fused zzrx stack + Ising readout.

QAOA alternates exp(-i gamma Σ w_ij Z_i Z_j) and exp(-i beta Σ X_q) — which
is exactly one ``zzrx_layer`` per depth-p round (zz phases with per-pair
angles gamma*w_ij, then rx(2*beta) on every qubit).  The cost
C = Σ w_ij (1 - ⟨Z_i Z_j⟩)/2 reads out through
``Circuit.expectation_ising_sum`` with weighted zz terms, so the whole
value-and-grad step lives inside ONE custom-VJP boundary on TPU
(core/kernels_stack.py).  Reference role: QAOA workflows in the reference's
examples and templates (templates/blocks.py QAOA_ansatz,
applications/graphdata.py) recast on the fused TPU path.

Runs on CPU in ~a minute; on a real chip set n up to ~26.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", os.environ.get("QAOA_PLATFORM", "cpu"))

import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc


def main():
    n, p_depth = 12, 4
    rng = np.random.default_rng(7)
    # random weighted graph, ~2 extra edges per vertex
    edges = []
    for i in range(n):
        cand = np.arange(i + 1, n)
        if len(cand):
            for j in rng.choice(cand, size=min(2, len(cand)), replace=False):
                edges.append((i, int(j), float(rng.uniform(0.5, 1.5))))
    wsum = sum(w for _, _, w in edges)

    zz_terms = [(a, b, 0.5 * w) for a, b, w in edges]  # C = wsum/2 - Σ w/2 <ZZ>

    def cost(params):
        gammas, betas = params[:p_depth], params[p_depth:]
        c = tc.Circuit(n)
        c.h_layer()
        for r in range(p_depth):
            zz = jnp.asarray([w for _, _, w in edges]) * gammas[r]
            rx = jnp.full((n,), 2.0 * betas[r])
            c.zzrx_layer([(a, b) for a, b, _ in edges], zz, rx)
        # expected UNCUT weight term: Σ w/2 <ZZ>; minimize it
        return c.expectation_ising_sum(zz_terms=zz_terms)

    import optax

    vg = jax.jit(jax.value_and_grad(cost))
    params = jnp.asarray(rng.uniform(0.1, 0.5, size=(2 * p_depth,)), jnp.float32)
    opt = optax.adam(0.05)
    st = opt.init(params)
    for it in range(300):
        v, g = vg(params)
        up, st = opt.update(g, st)
        params = params + up
        if it % 60 == 0:
            print(f"iter {it:3d}  <cut> = {0.5 * wsum - float(v):.4f}")

    qaoa_cut = 0.5 * wsum - float(vg(params)[0])

    # exact max cut by enumeration (n small)
    best = 0.0
    for x in range(2**n):
        cut = sum(
            w for a, b, w in edges if ((x >> a) & 1) != ((x >> b) & 1)
        )
        best = max(best, cut)
    print(f"QAOA p={p_depth}: <cut> = {qaoa_cut:.4f} / exact max {best:.4f} "
          f"(ratio {qaoa_cut/best:.3f})")
    assert qaoa_cut / best > 0.75


if __name__ == "__main__":
    main()
