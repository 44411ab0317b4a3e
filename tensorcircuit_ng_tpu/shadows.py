"""Classical shadows toolbox.

Counterpart of reference ``shadows.py``: vmapped snapshot acquisition
(``shadow_snapshots`` ``:46``), local/global state reconstruction
(``:119-213, 447-552``), Pauli-string estimation with median-of-means
(``expectation_ps_shadow`` ``:214``), Rényi-2 entropy (``:304-446``), and
the sample-count bound (``shadow_bound`` ``:17``).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple, Union

import numpy as np
import jax
import jax.numpy as jnp

from . import config
from .backend import backend as K
from .core import statevec

Tensor = Any

__all__ = [
    "shadow_bound",
    "shadow_snapshots",
    "local_snapshot_states",
    "global_shadow_state",
    "expectation_ps_shadow",
    "entropy_shadow",
    "renyi_entropy_2",
]


def shadow_bound(
    observables: Union[Tensor, Sequence[Sequence[int]]], epsilon: float, delta: float = 0.01
) -> Tuple[int, int]:
    """(N, k): total snapshots and equal parts for median-of-means.

    Reference ``shadows.py:17-45`` (Huang-Kueng-Preskill bound).
    """
    obs = np.asarray(observables)
    m = obs.shape[0]
    k = int(2 * np.log(2 * m / delta))
    max_locality = int(np.max(np.sum(obs != 0, axis=-1)))
    shadow_norm = 4**max_locality  # ||O||_shadow^2 <= 4^loc ||O||^2
    n_per = int(34 * shadow_norm / (epsilon**2))
    return n_per * k, k


# basis-rotation matrices: rotate measurement basis b (0=X,1=Y,2=Z) into Z
_ROT = np.stack(
    [
        np.array([[1, 1], [1, -1]]) / np.sqrt(2),  # H (X basis)
        np.array([[1, -1j], [1, 1j]]) / np.sqrt(2),  # H S† (Y basis)
        np.eye(2),  # Z basis
    ]
)


def shadow_snapshots(
    psi: Tensor,
    pauli_strings: Tensor,
    status: Optional[Tensor] = None,
    measurement_only: bool = False,
) -> Tensor:
    """Measure ``psi`` in random Pauli bases.

    ``pauli_strings``: int tensor [ns, nq] with entries 0/1/2 for X/Y/Z;
    ``status``: uniform [ns, repeat, nq] randomness.  Returns snapshot bits
    [ns, repeat, nq] (reference ``shadow_snapshots`` ``shadows.py:46-118``).
    """
    psi = jnp.reshape(jnp.asarray(psi), (-1,))
    nq = statevec.num_slots(psi)
    pauli_strings = jnp.asarray(pauli_strings, dtype=jnp.int32)
    ns = pauli_strings.shape[0]
    if status is None:
        status = K.implicit_randu([ns, 1])
    status = jnp.asarray(status)  # [ns, repeat] per reference A.6
    repeat = status.shape[1]

    rot = jnp.asarray(_ROT, dtype=psi.dtype)

    def one_string(string: Tensor, sts: Tensor) -> Tensor:
        phi = psi
        for q in range(nq):
            m = jnp.take(rot, string[q], axis=0)
            phi = statevec.apply_unitary(phi, m, [q])
        p = statevec.probabilities(phi)
        p = p / jnp.sum(p)
        cdf = jnp.cumsum(p)

        def one_shot(r: Tensor) -> Tensor:
            idx = jnp.searchsorted(cdf, r.astype(cdf.dtype), side="right")
            idx = jnp.clip(idx, 0, p.shape[0] - 1)
            bits = (idx // (2 ** jnp.arange(nq - 1, -1, -1))) % 2
            return bits.astype(jnp.int32)

        return jax.vmap(one_shot)(sts)

    return jax.vmap(one_string)(pauli_strings, status)


def local_snapshot_states(snapshots: Tensor, pauli_strings: Tensor, sub: Optional[Sequence[int]] = None) -> Tensor:
    """Per-qubit inverse-channel states 3 U†|b⟩⟨b|U - I.

    Returns [ns, repeat, nq, 2, 2] (reference ``shadows.py:119-213``).
    """
    snapshots = jnp.asarray(snapshots)
    pauli_strings = jnp.asarray(pauli_strings, dtype=jnp.int32)
    if pauli_strings.ndim == 2:
        pauli_strings = pauli_strings[:, None, :]
        pauli_strings = jnp.broadcast_to(
            pauli_strings, snapshots.shape
        )
    rot = jnp.asarray(_ROT, dtype=jnp.dtype(config.dtypestr()))
    eye = jnp.eye(2, dtype=rot.dtype)

    def one(b: Tensor, u_idx: Tensor) -> Tensor:
        u = jnp.take(rot, u_idx, axis=0)  # rotation into Z basis
        ket = jax.nn.one_hot(b, 2, dtype=rot.dtype)
        # measured-basis projector back-rotated: U† |b><b| U
        proj = jnp.outer(jnp.conj(u.T) @ ket, jnp.conj((jnp.conj(u.T) @ ket)))
        return 3.0 * proj - eye

    flat_b = jnp.reshape(snapshots, (-1,))
    flat_u = jnp.reshape(pauli_strings, (-1,))
    states = jax.vmap(one)(flat_b, flat_u)
    return jnp.reshape(states, snapshots.shape + (2, 2))


def global_shadow_state(
    snapshots: Tensor,
    pauli_strings: Optional[Tensor] = None,
    sub: Optional[Sequence[int]] = None,
) -> Tensor:
    """Average global snapshot state (2^m x 2^m) over all snapshots.

    ``sub`` restricts to a qubit subset (reference ``shadows.py:447-552``).
    """
    lss = (
        snapshots
        if snapshots.ndim == 5
        else local_snapshot_states(snapshots, pauli_strings)
    )
    ns, repeat, nq = lss.shape[:3]
    if sub is not None:
        lss = lss[:, :, list(sub)]
        nq = len(sub)

    def kron_chain(mats: Tensor) -> Tensor:
        out = mats[0]
        for q in range(1, nq):
            out = jnp.kron(out, mats[q])
        return out

    flat = jnp.reshape(lss, (ns * repeat, nq, 2, 2))
    states = jax.vmap(kron_chain)(flat)
    return jnp.mean(states, axis=0)


def expectation_ps_shadow(
    snapshots: Tensor,
    pauli_strings: Optional[Tensor] = None,
    x: Optional[Sequence[int]] = None,
    y: Optional[Sequence[int]] = None,
    z: Optional[Sequence[int]] = None,
    ps: Optional[Sequence[int]] = None,
    k: int = 1,
) -> list:
    """Median-of-means estimates of a Pauli-string expectation.

    Returns a list of k batch means (reference ``shadows.py:214-303``
    returns the per-batch estimates; take ``np.median`` for the final value).
    """
    snapshots = jnp.asarray(snapshots)
    ns, repeat, nq = snapshots.shape
    if ps is not None:
        obs = [int(v) for v in ps]
    else:
        obs = [0] * nq
        for q in x or ():
            obs[q] = 1
        for q in y or ():
            obs[q] = 2
        for q in z or ():
            obs[q] = 3
    pauli_strings = jnp.asarray(pauli_strings, dtype=jnp.int32)

    # single-shot estimator: prod over observed qubits of 3*(±1 match) if
    # basis matches, else the whole snapshot contributes 0
    obs_arr = np.asarray(obs)
    active = np.nonzero(obs_arr)[0]

    def one(string: Tensor, bits: Tensor) -> Tensor:
        est = jnp.ones((), dtype=jnp.float32)
        for q in active:
            basis_match = string[q] == (obs_arr[q] - 1)
            sign = 1.0 - 2.0 * bits[q].astype(jnp.float32)
            est = est * jnp.where(basis_match, 3.0 * sign, 0.0)
        return est

    ests = jax.vmap(
        lambda s, bs: jnp.mean(jax.vmap(lambda b: one(s, b))(bs))
    )(pauli_strings, snapshots)  # [ns]
    per_batch = ns // k
    out = []
    for i in range(k):
        out.append(jnp.mean(ests[i * per_batch : (i + 1) * per_batch]))
    return out


def renyi_entropy_2(
    snapshots: Tensor,
    sub: Optional[Sequence[int]] = None,
    *,
    subsystem_to_keep: Optional[Sequence[int]] = None,
    subsystems_to_trace_out: Optional[Sequence[int]] = None,
) -> float:
    """Second Rényi entropy from randomized-measurement bit snapshots.

    Brydges et al., Science 364, 260 (2019) signed estimator (reference
    ``shadows.py:363-446`` semantics and signature): ``snapshots`` is the
    (ns, repeat, nq) bit array of ``repeat`` shots per random local-basis
    setting, ``sub``/``subsystem_to_keep`` names qubits to KEEP
    (``subsystems_to_trace_out`` its complement).  tr(rho_A^2) is estimated
    as 2^nq * sum_{x,y} pp(x,y) (-2)^{-H(x,y)} over observed substrings —
    unbiased across settings, unlike the plug-in purity of the mean shadow
    state (use :func:`entropy_shadow` for the reconstructed-state variant).
    With too few snapshots the signed sum can go nonpositive; the NaN/inf
    return is the "estimate failed" signal, not a finite entropy.
    """
    snap = np.asarray(jax.device_get(jnp.asarray(snapshots))).astype(np.int64)
    if snap.ndim == 2:
        snap = snap[:, None, :]
    nq_full = snap.shape[2]
    if subsystem_to_keep is not None and subsystems_to_trace_out is not None:
        raise ValueError(
            "give only one of subsystem_to_keep / subsystems_to_trace_out"
        )
    if subsystems_to_trace_out is not None:
        keep = [q for q in range(nq_full) if q not in set(subsystems_to_trace_out)]
    elif subsystem_to_keep is not None:
        keep = list(subsystem_to_keep)
    elif sub is not None:
        keep = list(sub)
    else:
        keep = list(range(nq_full))
    snap = snap[:, :, keep]
    ns, repeat, nq = snap.shape
    # integer code per shot, histogram per measurement setting
    codes = (snap << np.arange(nq - 1, -1, -1)[None, None, :]).sum(-1)
    uniq, inv = np.unique(codes.reshape(-1), return_inverse=True)
    m = uniq.shape[0]
    counts = np.zeros((m, ns), dtype=np.float64)
    inv2 = inv.reshape(ns, repeat)
    for i in range(ns):
        np.add.at(counts[:, i], inv2[i], 1.0)
    # pairwise Hamming distances between observed substrings
    x = uniq[:, None] ^ uniq[None, :]
    h = np.zeros_like(x)
    for _ in range(nq):
        h += x & 1
        x >>= 1
    # unbiased U-statistic over DISTINCT shot pairs within each setting:
    # E[c_x c_y] = R^2 p_x p_y + R(delta_xy p_x - p_x p_y), so the plain
    # count product (what the reference sums) carries an O(2^nq/repeat)
    # self-pair bias on the purity; subtracting the diagonal removes it
    if repeat < 2:
        raise ValueError(
            "renyi_entropy_2 needs repeat >= 2 shots per measurement setting "
            "(cross-shot pairs within one random basis)"
        )
    pair = counts @ counts.T
    np.fill_diagonal(pair, np.diag(pair) - counts.sum(axis=1))
    pp = pair / (ns * repeat * (repeat - 1))
    tr = float(np.sum(pp * (-2.0) ** (-h)))
    return float(-np.log(tr * 2**nq))


def entropy_shadow(
    snapshots: Tensor,
    pauli_strings: Optional[Tensor] = None,
    sub: Optional[Sequence[int]] = None,
    alpha: int = 2,
    *,
    subsystem_to_keep: Optional[Sequence[int]] = None,
    subsystems_to_trace_out: Optional[Sequence[int]] = None,
) -> Tensor:
    """Rényi-alpha entropy from the shadow state (reference ``:304-446``).

    The kept subsystem resolves from exactly one of ``sub`` /
    ``subsystem_to_keep`` / ``subsystems_to_trace_out`` (reference dual-kwarg
    convention).
    """
    if alpha <= 0:
        raise ValueError("alpha must be a positive integer")
    shape = jnp.asarray(snapshots).shape
    # bit snapshots: (ns, nq) or (ns, repeat, nq); snapshot STATES:
    # (ns, repeat, nq, 2, 2) — the qubit axis is axis 2 (reference), or the
    # last axis for 2-D input
    nq = shape[1] if len(shape) == 2 else shape[2]
    if subsystem_to_keep is not None and subsystems_to_trace_out is not None:
        raise ValueError(
            "give only one of subsystem_to_keep / subsystems_to_trace_out"
        )
    if sub is not None and (
        subsystem_to_keep is not None or subsystems_to_trace_out is not None
    ):
        import warnings

        warnings.warn(
            "both sub and a subsystem keyword given: the keyword wins and "
            "sub is ignored (reference convention)",
            UserWarning,
        )
    if subsystems_to_trace_out is not None:
        out = set(int(q) for q in subsystems_to_trace_out)
        if any(q >= nq or q < 0 for q in out):
            raise ValueError("subsystem index out of range")
        sub = [q for q in range(nq) if q not in out]
    elif subsystem_to_keep is not None:
        sub = [int(q) for q in subsystem_to_keep]
    if sub is not None and any(int(q) >= nq or int(q) < 0 for q in sub):
        raise ValueError("subsystem index out of range")
    rho = global_shadow_state(snapshots, pauli_strings, sub=sub)
    lam = jnp.real(jnp.linalg.eigvalsh(rho))
    lam = jnp.clip(lam, 1e-12, None)
    lam = lam / jnp.sum(lam)
    if alpha == 1:
        return -jnp.sum(lam * jnp.log(lam))
    return jnp.log(jnp.sum(lam**alpha)) / (1 - alpha)


def slice_sub(entirety: Tensor, sub: Sequence[int]) -> Tensor:
    """Slice the per-qubit axis (axis 2) down to ``sub`` (reference ``shadows.py:553``)."""
    entirety = jnp.asarray(entirety)
    if entirety.ndim < 3:
        entirety = entirety[:, None, :]
    return jnp.take(entirety, np.asarray(list(sub), dtype=np.int32), axis=2)


def _lss_of(snapshots: Tensor, pauli_strings: Optional[Tensor], sub: Optional[Sequence[int]]) -> Tensor:
    snapshots = jnp.asarray(snapshots)
    if pauli_strings is not None:
        if snapshots.ndim != 3:
            raise ValueError(
                f"snapshots should be 3-d if pauli_strings is not None, got {snapshots.ndim}-d instead."
            )
        lss = local_snapshot_states(snapshots, pauli_strings)
        if sub is not None:
            lss = slice_sub(lss, sub)
        return lss
    if sub is not None:
        return slice_sub(snapshots, sub)
    return snapshots


def global_shadow_state1(
    snapshots: Tensor,
    pauli_strings: Optional[Tensor] = None,
    sub: Optional[Sequence[int]] = None,
) -> Tensor:
    """Global shadow state via one big einsum (reference ``shadows.py:447``)."""
    lss = _lss_of(snapshots, pauli_strings, sub)
    ns, repeat, nq = lss.shape[:3]
    abc = "cdefghijklmnopqrstuvwxyz"
    operands = []
    terms = []
    for q in range(nq):
        operands.append(lss[:, :, q])
        terms.append(f"ab{abc[2 * q]}{abc[2 * q + 1]}")
    out = "ab" + abc[0 : 2 * nq : 2] + abc[1 : 2 * nq : 2]
    g = jnp.einsum(",".join(terms) + "->" + out, *operands)
    g = jnp.reshape(g, (ns, repeat, 2**nq, 2**nq))
    return jnp.mean(g, axis=(0, 1))


def global_shadow_state2(
    snapshots: Tensor,
    pauli_strings: Optional[Tensor] = None,
    sub: Optional[Sequence[int]] = None,
) -> Tensor:
    """Global shadow state via vmapped kron chains (reference ``shadows.py:496``)."""
    lss = _lss_of(snapshots, pauli_strings, sub)
    ns, repeat, nq = lss.shape[:3]

    def kron_chain(mats: Tensor) -> Tensor:
        out = mats[0]
        for q in range(1, nq):
            out = jnp.kron(out, mats[q])
        return out

    flat = jnp.reshape(lss, (ns * repeat, nq, 2, 2))
    states = jax.vmap(kron_chain)(flat)
    return jnp.mean(states, axis=0)
