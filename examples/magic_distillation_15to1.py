"""15-to-1 magic state distillation on the Clifford+T sampling engine.

Reference examples stabilizert_15to1_distillation.py role (physics: Bravyi
& Kitaev, quant-ph/0403025).  The [[15,1,3]] punctured-Reed-Muller CSS code
has transversal T: applying T to every physical qubit of the logical
|+_L> yields the logical magic state |T^dag_L>.  Dephasing (Z-twirled
magic-state) noise of rate p on the 15 T gates is detected by the 4
X-stabilizers; post-selecting on a clean syndrome leaves an output error
of 35 p^3 + O(p^5) — quadratic noise suppression.

Construction here (independent of the reference's code):
- H_X = 4 linear forms, H_Z = 4 linear + 6 quadratic forms on the 4-bit
  labels x = qubit+1 (CSS orthogonality asserted);
- encoder |0^15> -> |+_L> from the GF(2) RREF of H_Z (H on free columns,
  CNOT free->pivot);
- after the noisy transversal-T layer the DECODER runs, the 5 free qubits
  are parity-collected, the 4 gauge qubits are read in X (detectors, =
  the X-syndrome) and the probe qubit is read after T.H (observable);
- EXACT oracle: a dephasing pattern e acts in the decoded 5-qubit picture
  as Z^{g(e)} with g_f = e . v_f (v_f = nullspace basis); the 32 possible
  g values are classified accept/flip by a dense 32-dim simulation, and
  the full error distribution is enumerated over all 2^15 patterns.
  Monte-Carlo detector sampling must match, and the small-p limit must
  reproduce 35 p^3.
"""

import itertools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

from tensorcircuit_ng_tpu.zx.stabilizertcircuit import StabilizerTCircuit

N = 15


def build_code():
    bits = lambda x: [(x >> i) & 1 for i in range(4)]
    hx = np.array([[bits(q + 1)[i] for q in range(N)] for i in range(4)], dtype=np.int64)
    rows = [hx[i] for i in range(4)]
    for i, j in itertools.combinations(range(4), 2):
        rows.append(hx[i] * hx[j])
    hz = np.array(rows, dtype=np.int64)
    assert (hx @ hz.T % 2 == 0).all(), "CSS orthogonality"
    return hx, hz


def gf2_rref(m):
    m = m.copy() % 2
    pivots = []
    r = 0
    for c in range(m.shape[1]):
        rows = np.nonzero(m[r:, c])[0]
        if len(rows) == 0:
            continue
        m[[r, r + rows[0]]] = m[[r + rows[0], r]]
        for rr in range(m.shape[0]):
            if rr != r and m[rr, c]:
                m[rr] = (m[rr] + m[r]) % 2
        pivots.append(c)
        r += 1
        if r == m.shape[0]:
            break
    return m, pivots


def encoder_ops(hz):
    """(free columns, CNOT list free->pivot) for |+_L> = uniform null(H_Z)."""
    rref, pivots = gf2_rref(hz)
    frees = [c for c in range(N) if c not in pivots]
    cnots = []
    for r, p in enumerate(pivots):
        for f in frees:
            if rref[r, f]:
                cnots.append((f, p))
    # nullspace basis: v_f has 1 at free col f and at every pivot it feeds
    vs = {}
    for f in frees:
        v = np.zeros(N, dtype=np.int64)
        v[f] = 1
        for r, p in enumerate(pivots):
            v[p] = rref[r, f]
        vs[f] = v
        assert ((hz @ v) % 2 == 0).all()
    return pivots, frees, cnots, vs


# ---------------------------------------------------------------------------
# exact 5-bit-picture oracle
# ---------------------------------------------------------------------------


def probe_outcomes(frees):
    """Classify each g in F_2^5: (accepted: gauge bits all 0, probe flip).

    Decoded state (free qubits, computational basis, before the decoder's
    H's): sum_s phase(parity s) (-1)^{g.s} |s>/sqrt(32), phase(1)=e^{-i pi/4}.
    Probe circuit: CNOT(f_i -> f_0) for i>=1; H on f_1..f_4; T then H on f_0.
    Outcomes are deterministic for every g (asserted).
    """
    nf = len(frees)
    dim = 2**nf
    amp0 = np.zeros(dim, dtype=complex)
    for s in range(dim):
        par = bin(s).count("1") % 2
        amp0[s] = np.exp(-1j * np.pi / 4) if par else 1.0
    amp0 /= np.linalg.norm(amp0)

    # bit f of index s: use f=0 as the probe target, 1..4 as gauge
    def bit(s, f):
        return (s >> (nf - 1 - f)) & 1

    # CNOT(f_i -> f_0) parity collection as a basis relabeling
    def collect(vec):
        out = np.zeros_like(vec)
        for s in range(dim):
            t = s
            for i in range(1, nf):
                if bit(s, i):
                    t ^= 1 << (nf - 1)
            out[t] += vec[s]
        return out

    h1 = np.array([[1, 1], [1, -1]]) / np.sqrt(2)
    tmat = np.diag([1.0, np.exp(1j * np.pi / 4)])

    def apply_1q(vec, m, f):
        v = vec.reshape((2,) * nf)
        v = np.tensordot(m, v, axes=([1], [f]))
        v = np.moveaxis(v, 0, f)
        return v.reshape(dim)

    table = {}
    for gidx in range(dim):
        g = [bit(gidx, f) for f in range(nf)]
        vec = amp0 * np.array(
            [(-1) ** sum(g[f] * bit(s, f) for f in range(nf)) for s in range(dim)]
        )
        vec = collect(vec)
        for f in range(1, nf):
            vec = apply_1q(vec, h1, f)
        vec = apply_1q(vec, tmat, 0)
        vec = apply_1q(vec, h1, 0)
        probs = np.abs(vec) ** 2
        # marginal outcome of each qubit must be deterministic
        outs = []
        for f in range(nf):
            p1 = probs[[s for s in range(dim) if bit(s, f)]].sum()
            assert p1 < 1e-9 or p1 > 1 - 1e-9, (gidx, f, p1)
            outs.append(int(p1 > 0.5))
        accept = all(o == 0 for o in outs[1:])
        flip = outs[0] == 1
        table[gidx] = (accept, flip)
    return table


def exact_rates(p, vs, frees, table):
    """Enumerate all 2^15 dephasing patterns exactly."""
    vmat = np.stack([vs[f] for f in frees])  # (5, 15)
    es = np.array(
        [[(m >> q) & 1 for q in range(N)] for m in range(2**N)], dtype=np.int64
    )
    w = es.sum(axis=1)
    pe = p**w * (1 - p) ** (N - w)
    gs = es @ vmat.T % 2  # (2^15, 5)
    gidx = sum(gs[:, f] << (len(frees) - 1 - f) for f in range(len(frees)))
    acc = np.array([table[int(i)][0] for i in gidx])
    flip = np.array([table[int(i)][1] for i in gidx])
    p_accept = pe[acc].sum()
    p_out = pe[acc & flip].sum() / p_accept
    return p_accept, p_out


def build_circuit(p, pivots, frees, cnots):
    c = StabilizerTCircuit(N)
    nrec = 0
    for f in frees:
        c.h(f)
    for f, piv in cnots:
        c.cnot(f, piv)
    for q in range(N):
        c.t(q)
        c.z_error(q, p=p)
    for f, piv in reversed(cnots):
        c.cnot(f, piv)
    # (decoder's free-qubit H's are absorbed into the probe below)
    target, gauge = frees[0], frees[1:]
    for fq in gauge:
        c.cnot(fq, target)
    for fq in gauge:
        c.h(fq)
    c.t(target)
    c.h(target)
    # measurements: pivots (always 0 under dephasing), gauge (detectors),
    # target (observable)
    for piv in pivots:
        c.measure_instruction(piv)
        nrec += 1
    for fq in gauge:
        c.measure_instruction(fq)
        nrec += 1
    c.measure_instruction(target)
    nrec += 1
    for k in range(len(pivots) + len(gauge)):
        c.detector_instruction(k - nrec)
    c.observable_include(-1)
    return c


def main():
    hx, hz = build_code()
    pivots, frees, cnots, vs = encoder_ops(hz)
    print(f"[[15,1,3]]: pivots {pivots}, frees {frees}, {len(cnots)} encoder CNOTs")
    table = probe_outcomes(frees)
    # sanity: no error -> accepted, no flip; the 35 weight-3 undetected
    # codeword errors all flip the output
    assert table[0] == (True, False)
    n_bad3 = sum(
        1
        for m in range(2**N)
        if bin(m).count("1") == 3
        and table[
            int(
                sum(
                    ((np.array([(m >> q) & 1 for q in range(N)]) @ np.stack(
                        [vs[f] for f in frees]
                    ).T % 2)[f] << (len(frees) - 1 - f))
                    for f in range(len(frees))
                )
            )
        ]
        == (True, True)
    )
    print(f"undetected weight-3 flips: {n_bad3} (theory: 35)")
    assert n_bad3 == 35

    # exact small-p limit reproduces 35 p^3
    pa, po = exact_rates(1e-3, vs, frees, table)
    print(f"p=1e-3 exact: accept {pa:.6f}, out {po:.3e} (35p^3 = {35e-9:.3e})")
    assert abs(po / 35e-9 - 1) < 0.05

    # Monte-Carlo on the Clifford+T engine vs exact enumeration
    p = 0.08
    pa, po = exact_rates(p, vs, frees, table)
    c = build_circuit(p, pivots, frees, cnots)
    shots = 6000
    dets, obs = c.sample_detectors(shots, separate_observables=True, seed=11, batch_size=600)
    dets = np.asarray(dets)
    obs = np.asarray(obs)
    ok = ~dets.any(axis=1)
    mc_accept = ok.mean()
    mc_out = obs[ok, 0].mean()
    print(f"p={p}: accept MC {mc_accept:.4f} vs exact {pa:.4f}; "
          f"out MC {mc_out:.4f} vs exact {po:.4f}")
    assert abs(mc_accept - pa) < 0.03
    assert abs(mc_out - po) < 0.012
    assert mc_out < p / 3  # distillation actually distills
    print("OK")


if __name__ == "__main__":
    main()
