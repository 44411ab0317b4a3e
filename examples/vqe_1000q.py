"""1000-qubit 1D TFIM VQE (reference README.md:208 max-scale claim).

TPU-native design: every Hamiltonian term's reverse lightcone in a depth-L
brickwork ansatz spans at most 4L+6 sites, so each expectation is an EXACT
small dense simulation of a parameter *window*; all ~2n terms evaluate as
ONE vmap over gathered windows (zero-padded parameters make every term an
"interior" term — rzz(0)=rx(0)=I). Memory is O(n * 2^(4L+6)) and the whole
energy+gradient is a single XLA program, linear in n.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu.core import statevec as sv

L = 2  # ansatz depth


def _window_state(zz_w, rx_w, w):
    """State of a w-site window from |+>^w under the brickwork ansatz.

    zz_w: (L, w) rzz angles, entry i for pair (i, i+1) (last col unused);
    rx_w: (L, w) rx angles.  Window start is aligned to even global sites so
    even/odd brick phases match the global circuit.
    """
    c = tc.Circuit(w)
    c.h_layer()
    even_pairs = [(i, i + 1) for i in range(0, w - 1, 2)]
    odd_pairs = [(i, i + 1) for i in range(1, w - 1, 2)]
    for l in range(L):
        c.rzz_product(even_pairs, jnp.stack([zz_w[l, i] for i, _ in even_pairs]))
        c.rzz_product(odd_pairs, jnp.stack([zz_w[l, i] for i, _ in odd_pairs]))
        c.rx_layer(rx_w[l])
    return c.state()


def make_energy(n):
    w = 4 * L + 6  # window: cone width 4L+2 plus safety margin
    pad = w  # zero padding on both ends
    center = w // 2 - 1  # window position of the term's left site

    def energy(params):
        zz = params[:, 0, :]  # (L, n) pair angles, index = left site
        rx = params[:, 1, :]  # (L, n)
        # pair (n-1, n) does not exist: zero its angle before padding
        zz = zz.at[:, n - 1].set(0.0)
        zzp = jnp.pad(zz, ((0, 0), (pad, pad)))
        rxp = jnp.pad(rx, ((0, 0), (pad, pad)))

        def gather(i0):
            # even-aligned window start so brick parity is global
            s = i0 - center
            s = s - (s % 2)
            idx = s + pad + jnp.arange(w)
            return (
                jnp.take(zzp, idx, axis=1),
                jnp.take(rxp, idx, axis=1),
                i0 - s,
            )

        def zz_term(i0):
            zz_w, rx_w, off = gather(i0)
            psi = _window_state(zz_w, rx_w, w)
            # off is traced; use one-hot pair selection over the window
            evs = sv.expectation_zz_sum(psi, [(k, k + 1) for k in range(w - 1)],
                                        weights=jax.nn.one_hot(off, w - 1))
            return jnp.real(evs)

        def x_term(i0):
            zz_w, rx_w, off = gather(i0)
            psi = _window_state(zz_w, rx_w, w)
            evs = jnp.stack(
                [jnp.real(jnp.vdot(psi, sv.flip_slot(psi, q))) for q in range(w)]
            )
            return jnp.dot(jax.nn.one_hot(off, w), evs)

        e_zz = jnp.sum(jax.vmap(zz_term)(jnp.arange(n - 1)))
        e_x = jnp.sum(jax.vmap(x_term)(jnp.arange(n)))
        return e_zz - e_x

    return energy


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    energy = make_energy(n)
    vg = jax.jit(jax.value_and_grad(energy))
    rng = np.random.default_rng(0)
    params = jnp.asarray(rng.normal(size=(L, 2, n)) * 0.1, dtype=jnp.float32)
    t0 = time.time()
    v, g = vg(params)
    v = float(v)
    print(f"n={n}: E = {v:.3f} (|g| = {float(jnp.linalg.norm(g)):.3f}) "
          f"compile+first {time.time()-t0:.1f}s; {params.size} parameters")
    import optax

    opt = optax.adam(2e-2)
    state = opt.init(params)
    t0 = time.time()
    for step in range(20):
        v, g = vg(params)
        updates, state = opt.update(g, state, params)
        params = optax.apply_updates(params, updates)
    print(f"20 steps in {time.time()-t0:.1f}s; E = {float(v):.3f} "
          f"(E/n = {float(v)/n:.5f}, exact TFIM thermodynamic limit ~ -2.5464/2)")
