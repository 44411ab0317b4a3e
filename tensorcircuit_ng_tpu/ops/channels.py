"""Quantum channels: Kraus sets and representation transforms.

Mirrors reference ``channels.py`` (channel factories ``:55-484``, rep
transforms kraus/super/choi ``:542-812``, ``composedkraus`` ``:1000``) on the
JAX backend.  Channels return a :class:`KrausList` of :class:`Gate` whose
tensors are dense matrices; Monte-Carlo (``Circuit.general_kraus``) and exact
(``DMCircuit``) engines both consume them.
"""

from __future__ import annotations

import math
from typing import Any, List, Optional, Sequence

import numpy as np
import jax.numpy as jnp

from .. import config
from .gates import Gate, _xp_of

Tensor = Any

__all__ = [
    "KrausList",
    "depolarizingchannel",
    "generaldepolarizingchannel",
    "isotropicdepolarizingchannel",
    "amplitudedampingchannel",
    "phasedampingchannel",
    "resetchannel",
    "thermalrelaxationchannel",
    "kraus_to_super",
    "kraus_to_super_gate",
    "super_to_choi",
    "choi_to_super",
    "kraus_to_choi",
    "choi_to_kraus",
    "super_to_kraus",
    "kraus_identity_check",
    "is_unitary_kraus",
    "composedkraus",
    "reshuffle",
    "is_hermitian_matrix",
    "krausgate_to_krausmatrix",
    "krausmatrix_to_krausgate",
    "evol_kraus",
    "evol_superop",
    "check_rep_transformation",
    "CHANNEL_NAMES",
]


class KrausList(list):
    """List of Kraus ``Gate``s with channel metadata."""

    def __init__(self, iterable: Sequence[Gate], name: str = "channel", is_unitary: bool = False):
        super().__init__(iterable)
        self.name = name
        self.is_unitary = is_unitary


def _g(m: Any, name: str) -> Gate:
    # concrete matrices stay NUMPY (axon cannot lower complex device-array
    # constants in jit programs — see CLAUDE.md complex rule); traced pass
    if not hasattr(m, "ndim"):
        m = np.asarray(m)
    return Gate(m.astype(np.dtype(config.dtypestr())), name=name)


def depolarizingchannel(px: float, py: float, pz: float) -> KrausList:
    r"""Single-qubit Pauli channel: K = {√(1-p)I, √px X, √py Y, √pz Z}.

    Reference ``channels.py:55-112``.
    """
    xp = _xp_of(px, py, pz)
    rdt = np.dtype(config.rdtypestr())
    i = xp.sqrt(xp.asarray(1.0 - px - py - pz).astype(rdt)) * np.eye(2)
    x = xp.sqrt(xp.asarray(px).astype(rdt)) * np.asarray([[0.0, 1.0], [1.0, 0.0]])
    y = xp.sqrt(xp.asarray(py).astype(rdt)) * np.asarray([[0.0, -1.0j], [1.0j, 0.0]])
    z = xp.sqrt(xp.asarray(pz).astype(rdt)) * np.asarray([[1.0, 0.0], [0.0, -1.0]])
    return KrausList(
        [_g(i, "dep_i"), _g(x, "dep_x"), _g(y, "dep_y"), _g(z, "dep_z")],
        name="depolarizing",
        is_unitary=True,
    )


def generaldepolarizingchannel(p: Any, num_qubits: int = 1) -> KrausList:
    r"""n-qubit depolarizing channel over all 4^n Pauli strings.

    ``p`` is a scalar (uniform non-identity probability) or a list of
    4^n - 1 probabilities (reference ``channels.py:113-194``).
    """
    paulis = [
        np.eye(2),
        np.array([[0.0, 1.0], [1.0, 0.0]]),
        np.array([[0.0, -1.0j], [1.0j, 0.0]]),
        np.array([[1.0, 0.0], [0.0, -1.0]]),
    ]
    strings: List[np.ndarray] = [np.eye(1)]
    for _ in range(num_qubits):
        strings = [np.kron(s, pm) for s in strings for pm in paulis]
    m = len(strings)  # 4^n
    if np.isscalar(p):
        probs = [1.0 - (m - 1) * p] + [p] * (m - 1)
    else:
        probs = [1.0 - float(np.sum(p))] + list(p)
    ops = [np.sqrt(pr) * s for pr, s in zip(probs, strings)]
    return KrausList(
        [_g(o, f"gdep_{k}") for k, o in enumerate(ops)],
        name="generaldepolarizing",
        is_unitary=True,
    )


def isotropicdepolarizingchannel(p: float, num_qubits: int = 1) -> KrausList:
    """Uniform depolarizing with total error probability ``p``."""
    m = 4**num_qubits
    return generaldepolarizingchannel(p / (m - 1), num_qubits)


def amplitudedampingchannel(gamma: float, p: float = 1.0) -> KrausList:
    r"""Generalized amplitude damping (reference ``channels.py:195-260``)."""
    xp = _xp_of(gamma, p)
    rdt = np.dtype(config.rdtypestr())
    g = xp.asarray(gamma).astype(rdt)
    pp = xp.asarray(p).astype(rdt)
    k0 = xp.sqrt(pp) * np.asarray([[1.0, 0.0], [0.0, 0.0]]) + xp.sqrt(pp) * np.asarray([[0.0, 0.0], [0.0, 1.0]]) * xp.sqrt(1 - g)
    k1 = xp.sqrt(pp) * xp.sqrt(g) * np.asarray([[0.0, 1.0], [0.0, 0.0]])
    k2 = xp.sqrt(1 - pp) * (
        xp.sqrt(1 - g) * np.asarray([[1.0, 0.0], [0.0, 0.0]])
        + np.asarray([[0.0, 0.0], [0.0, 1.0]])
    )
    k3 = xp.sqrt(1 - pp) * xp.sqrt(g) * np.asarray([[0.0, 0.0], [1.0, 0.0]])
    return KrausList(
        [_g(k0, "ad_0"), _g(k1, "ad_1"), _g(k2, "ad_2"), _g(k3, "ad_3")],
        name="amplitudedamping",
    )


def phasedampingchannel(gamma: float) -> KrausList:
    xp = _xp_of(gamma)
    g = xp.asarray(gamma).astype(np.dtype(config.rdtypestr()))
    k0 = np.asarray([[1.0, 0.0], [0.0, 0.0]]) + xp.sqrt(1 - g) * np.asarray(
        [[0.0, 0.0], [0.0, 1.0]]
    )
    k1 = xp.sqrt(g) * np.asarray([[0.0, 0.0], [0.0, 1.0]])
    return KrausList([_g(k0, "pd_0"), _g(k1, "pd_1")], name="phasedamping")


def resetchannel() -> KrausList:
    k0 = np.array([[1.0, 0.0], [0.0, 0.0]])
    k1 = np.array([[0.0, 1.0], [0.0, 0.0]])
    return KrausList([_g(k0, "reset_0"), _g(k1, "reset_1")], name="reset")


def thermalrelaxationchannel(
    t1: float,
    t2: float,
    time: float,
    method: str = "general",
    excitedstatepopulation: float = 0.0,
) -> KrausList:
    r"""T1/T2 thermal relaxation channel (reference ``channels.py:300-484``).

    ``method="AUTO"``/"general" uses the Choi construction valid for
    t2 <= t1; "ByKraus" valid for t2 <= t1 as closed-form Kraus set.
    """
    t1 = float(t1)
    t2 = float(t2)
    time = float(time)
    if t2 > 2 * t1:
        raise ValueError("t2 cannot exceed 2*t1")
    p_reset = 1.0 - math.exp(-time / t1)
    exp_t2 = math.exp(-time / t2)
    p1 = excitedstatepopulation
    if method.lower() in ("general", "auto", "bychoi") and t2 <= t1:
        method_eff = "kraus"
    elif method.lower() == "bykraus":
        method_eff = "kraus"
    else:
        method_eff = "choi"
    if method_eff == "kraus" and t2 <= t1:
        # closed-form Kraus for t2 <= t1
        pz = (1 - p_reset) * (1 - exp_t2 / max(1e-300, math.exp(-time / t1)) ) / 2
        pz = max(0.0, pz)
        pid = 1 - pz - p_reset
        k0 = math.sqrt(max(0.0, pid)) * np.eye(2)
        kz = math.sqrt(max(0.0, pz)) * np.diag([1.0, -1.0])
        kr0 = math.sqrt(max(0.0, p_reset * (1 - p1))) * np.array([[1.0, 0.0], [0.0, 0.0]])
        kr1 = math.sqrt(max(0.0, p_reset * (1 - p1))) * np.array([[0.0, 1.0], [0.0, 0.0]])
        ke0 = math.sqrt(max(0.0, p_reset * p1)) * np.array([[0.0, 0.0], [1.0, 0.0]])
        ke1 = math.sqrt(max(0.0, p_reset * p1)) * np.array([[0.0, 0.0], [0.0, 1.0]])
        ks = [k0, kz, kr0, kr1, ke0, ke1]
        ks = [k for k in ks if np.abs(k).max() > 0]
        return KrausList([_g(k, f"tr_{i}") for i, k in enumerate(ks)], name="thermalrelaxation")
    # Choi-based general construction (valid also for t1 < t2 <= 2 t1)
    # C = sum_ij |i><j| ⊗ E(|i><j|)
    e00 = 1 - p1 * p_reset
    e11 = p1 * p_reset
    f00 = (1 - p1) * p_reset
    f11 = 1 - (1 - p1) * p_reset
    c = np.zeros((4, 4), dtype=complex)
    c[0:2, 0:2] = np.diag([e00, e11])  # E(|0><0|)
    c[2:4, 2:4] = np.diag([f00, f11])  # E(|1><1|)
    c[0, 3] = exp_t2  # E(|0><1|) = exp_t2 |0><1|
    c[3, 0] = exp_t2
    return choi_to_kraus(c.astype(np.dtype(config.dtypestr())), name="thermalrelaxation")


# ------------------------------------------------------------------
# representation transforms (reference channels.py:542-812)
# ------------------------------------------------------------------


def _mats(kraus: Sequence[Any]) -> List[Tensor]:
    out = []
    for k in kraus:
        m = k.matrix() if isinstance(k, Gate) else k
        if not hasattr(m, "ndim"):
            m = np.asarray(m)
        if m.ndim != 2:
            dim = int(np.sqrt(np.prod(np.array(m.shape))))
            m = m.reshape(dim, dim)
        out.append(m.astype(np.dtype(config.dtypestr())))
    return out


def kraus_to_super(kraus: Sequence[Any]) -> Tensor:
    r"""Superoperator: S = Σ_k conj(K_k) ⊗ K_k acting on vec(ρ) row-major.

    Convention: vec(ρ') = S vec(ρ) with vec row-major (ρ_{ij} at i*d+j),
    S = Σ K ⊗ conj(K).
    """
    ms = _mats(kraus)
    s = None
    for m in ms:
        xp = _xp_of(m)
        term = xp.kron(m, m.conj())
        s = term if s is None else s + term
    return s


def kraus_to_super_gate(kraus: Sequence[Any]) -> Tensor:
    """Same as :func:`kraus_to_super` (reference ``channels.py:542``)."""
    return kraus_to_super(kraus)


def super_to_choi(s: Tensor) -> Tensor:
    r"""Reshuffle superoperator to Choi matrix.

    Conventions: row-major vec, S_{(a b),(i j)} = Σ K_{ai} conj(K_{bj}),
    C = Σ_ij |i><j| ⊗ E(|i><j|) so C_{(i a),(j b)} = S_{(a b),(i j)}.
    """
    d2 = s.shape[0]
    d = int(np.sqrt(d2))
    t = s.reshape(d, d, d, d)  # (a,b,i,j)
    return t.transpose(2, 0, 3, 1).reshape(d2, d2)  # (i,a,j,b)


def choi_to_super(c: Tensor) -> Tensor:
    d2 = c.shape[0]
    d = int(np.sqrt(d2))
    t = c.reshape(d, d, d, d)  # (i,a,j,b)
    return t.transpose(1, 3, 0, 2).reshape(d2, d2)  # (a,b,i,j)


def kraus_to_choi(kraus: Sequence[Any]) -> Tensor:
    ms = _mats(kraus)
    c = None
    for m in ms:
        v = m.T.reshape(-1, 1)  # v_{(i,a)} = K_{a i}
        term = v @ v.T.conj()
        c = term if c is None else c + term
    return c


def choi_to_kraus(c: Tensor, truncation_rules: Optional[dict] = None, name: str = "channel") -> KrausList:
    """Eigendecompose the Choi matrix into Kraus operators (host-side)."""
    c = np.asarray(c)
    d2 = c.shape[0]
    d = int(np.sqrt(d2))
    e, v = np.linalg.eigh(c)
    eps = 1e-10 if truncation_rules is None else truncation_rules.get("max_singular_values_eps", 1e-10)
    ks = []
    e_np = np.asarray(e)
    v_np = np.asarray(v)
    for i in range(d2 - 1, -1, -1):
        if e_np[i] > eps:
            k = math.sqrt(float(e_np[i])) * v_np[:, i].reshape(d, d).T
            ks.append(_g(k, f"{name}_{len(ks)}"))
    if not ks:
        ks = [_g(np.zeros((d, d)), f"{name}_0")]
    return KrausList(ks, name=name)


def super_to_kraus(s: Tensor) -> KrausList:
    return choi_to_kraus(super_to_choi(s))


def kraus_identity_check(kraus: Sequence[Any], atol: float = 1e-5) -> None:
    """Assert Σ K†K = I (CPTP check), reference ``channels.py:812-860``."""
    ms = _mats(kraus)
    d = ms[0].shape[0]
    acc = sum(m.T.conj() @ m for m in ms)
    np.testing.assert_allclose(np.asarray(acc), np.eye(d), atol=atol)


# backward-compatible reference alias (channels.py:539)
single_qubit_kraus_identity_check = kraus_identity_check


def is_unitary_kraus(kraus: Sequence[Any], atol: float = 1e-8) -> bool:
    """True if every Kraus operator is proportional to a unitary."""
    for m in _mats(kraus):
        mm = np.asarray(m.T.conj() @ m)
        lam = np.trace(mm) / mm.shape[0]
        if not np.allclose(mm, lam * np.eye(mm.shape[0]), atol=atol):
            return False
    return True


def composedkraus(kraus1: KrausList, kraus2: KrausList) -> KrausList:
    """Channel composition: all pairwise products (reference ``channels.py:1000``)."""
    out = []
    for a in kraus1:
        for b in kraus2:
            out.append(_g(a.matrix() @ b.matrix(), f"{a.name}@{b.name}"))
    return KrausList(
        out,
        name=f"{getattr(kraus1, 'name', 'k1')}∘{getattr(kraus2, 'name', 'k2')}",
        is_unitary=getattr(kraus1, "is_unitary", False)
        and getattr(kraus2, "is_unitary", False),
    )


def reshuffle(op: Tensor, order: Sequence[int]) -> Tensor:
    """Reshuffle the (out,out,in,in) leg order of a d^2 x d^2 matrix.

    Reference ``channels.py:651``.
    """
    xp = _xp_of(op)
    d0 = int(math.isqrt(int(op.shape[0])))
    d1 = int(math.isqrt(int(op.shape[1])))
    shape = (d0, d0, d1, d1)
    t = xp.transpose(xp.reshape(op, shape), tuple(order))
    return xp.reshape(
        t, (shape[order[0]] * shape[order[1]], shape[order[2]] * shape[order[3]])
    )


def is_hermitian_matrix(mat: Tensor, rtol: float = 1e-8, atol: float = 1e-5) -> bool:
    """True if ``mat`` is a 2D Hermitian matrix (reference ``channels.py:814``)."""
    mat = np.asarray(mat)
    if mat.ndim != 2 or mat.shape[0] != mat.shape[1]:
        return False
    return np.allclose(mat, mat.conj().T, rtol=rtol, atol=atol)


def krausgate_to_krausmatrix(kraus_list: Sequence[Any]) -> List[Tensor]:
    """Kraus operators in Gate form -> dense matrices (reference :835)."""
    return _mats(kraus_list)


def krausmatrix_to_krausgate(kraus_list: Sequence[Tensor]) -> List[Gate]:
    """Kraus operators in matrix form -> Gate form (reference :853)."""
    if not kraus_list or isinstance(kraus_list[0], Gate):
        return list(kraus_list)
    return [_g(np.asarray(k), f"kraus_{i}") for i, k in enumerate(kraus_list)]


def evol_kraus(density_matrix: Tensor, kraus_list: Sequence[Any]) -> Tensor:
    r"""ρ' = Σ_k K_k ρ K_k† (reference ``channels.py:873``); jit/AD-safe."""
    ms = _mats(kraus_list)
    rho = jnp.asarray(density_matrix)
    out = None
    for k in ms:
        k = jnp.asarray(k)
        term = k @ rho @ jnp.conj(k.T)
        out = term if out is None else out + term
    return out


def evol_superop(density_matrix: Tensor, superop: Tensor) -> Tensor:
    """Apply a superoperator (kraus_to_super convention) to ρ (reference :907).

    Our ``kraus_to_super`` uses row-major vec with S = Σ K ⊗ conj(K), so
    vec(ρ') = S vec(ρ) directly.
    """
    rho = jnp.asarray(density_matrix)
    d = rho.shape[0]
    vec = jnp.reshape(rho, (-1, 1))
    out = jnp.asarray(superop) @ vec
    return jnp.reshape(out, (d, d))


def check_rep_transformation(
    kraus: Sequence[Any], density_matrix: Tensor, verbose: bool = False
) -> None:
    """Round-trip consistency asserts across kraus/choi/super (reference :942)."""
    choi = kraus_to_choi(kraus)
    kraus2 = choi_to_kraus(choi)
    choi2 = kraus_to_choi(kraus2)
    if verbose:  # pragma: no cover
        print("kraus:", kraus)
        print("kraus_new:", kraus2)
    superop = kraus_to_super(kraus)
    superop2 = choi_to_super(choi)
    np.testing.assert_allclose(np.asarray(superop), np.asarray(superop2), atol=1e-5)
    kraus_identity_check(kraus2)
    np.testing.assert_allclose(np.asarray(choi), np.asarray(choi2), atol=1e-5)
    dm1 = np.asarray(evol_kraus(density_matrix, kraus))
    dm2 = np.asarray(evol_kraus(density_matrix, kraus2))
    np.testing.assert_allclose(dm1, dm2, atol=1e-5)
    dm3 = np.asarray(evol_superop(density_matrix, superop))
    np.testing.assert_allclose(dm1, dm3, atol=1e-5)


#: channel factory registry for circuit-method metaprogramming
CHANNEL_NAMES = {
    "depolarizing": depolarizingchannel,
    "generaldepolarizing": generaldepolarizingchannel,
    "isotropicdepolarizing": isotropicdepolarizingchannel,
    "amplitudedamping": amplitudedampingchannel,
    "phasedamping": phasedampingchannel,
    "reset": resetchannel,
    "thermalrelaxation": thermalrelaxationchannel,
}
