"""Two-site DMRG vs exact diagonalization (small-system oracle)."""

import numpy as np

from tensorcircuit_ng_tpu import dmrg as D
from tensorcircuit_ng_tpu import quantum as qu


def test_dmrg_xxz_matches_exact():
    n, delta, stag = 8, 1.4, 0.2
    mpo = D.xxz_mpo(n, delta, stag)
    e, mps = D.dmrg(mpo, chi=16, sweeps=4)
    ls, ws = [], []
    for i in range(n - 1):
        for p, w in ((1, 1.0), (2, 1.0), (3, delta)):
            l = [0] * n
            l[i] = p
            l[i + 1] = p
            ls.append(l)
            ws.append(w)
    for i in range(n):
        l = [0] * n
        l[i] = 3
        ls.append(l)
        ws.append(stag * (-1) ** i)
    h = qu.PauliStringSum2Dense(ls, ws, numpy=True)
    e_exact = float(np.linalg.eigvalsh(h)[0])
    np.testing.assert_allclose(e, e_exact, atol=1e-7)
    np.testing.assert_allclose(D.mps_energy(mps, mpo), e_exact, atol=1e-7)
    np.testing.assert_allclose(abs(D.mps_overlap(mps, mps)), 1.0, atol=1e-8)
    # truncated chi solves approximately (variational upper bound)
    e4, _ = D.dmrg(mpo, chi=4, sweeps=4)
    assert e4 >= e_exact - 1e-9
    assert e4 - e_exact < 0.05


def test_dmrg_mps_feeds_mpscircuit():
    import jax

    import tensorcircuit_ng_tpu as tc

    n = 6
    mpo = D.xxz_mpo(n, 1.0, 0.0)
    e, mps = D.dmrg(mpo, chi=8, sweeps=3)
    c = tc.MPSCircuit(n, tensors=[t.astype(np.complex64) for t in mps])
    psi = np.asarray(c.wavefunction())
    h = qu.PauliStringSum2Dense(
        [[0] * i + [p] + [p] + [0] * (n - i - 2) for i in range(n - 1) for p in (1, 2, 3)],
        [1.0] * (3 * (n - 1)),
        numpy=True,
    )
    np.testing.assert_allclose(
        float(np.real(psi.conj() @ h @ psi)), e, atol=1e-5
    )
