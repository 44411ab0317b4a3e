"""``Circuit``: the exact statevector simulator.

Counterpart of reference ``circuit.py`` on the dense TPU engine: state-vector
simulation with jittable Monte-Carlo noise (``unitary_kraus``
``circuit.py:404-510``, ``general_kraus`` ``:512-623``), post-selection
``mid_measurement`` (``:196``), conditional measurement, whole-circuit
``matrix()`` (``:744``), and the free function ``expectation`` (``:920-1065``).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple, Union

import numpy as np
import jax
import jax.numpy as jnp

from .. import config
from ..backend import backend as K
from ..core import statevec
from ..ops import channels as channels_mod
from ..ops.gates import Gate
from .basecircuit import BaseCircuit
from .detectors import DetectorMixin

Tensor = Any

__all__ = ["Circuit", "expectation"]


class Circuit(DetectorMixin, BaseCircuit):
    """Exact statevector circuit simulator (dense TPU engine)."""

    def __init__(
        self,
        nqubits: int,
        inputs: Optional[Tensor] = None,
        mps_inputs: Optional[Any] = None,
        split: Optional[Dict[str, Any]] = None,
        dim: int = 2,
        mesh: Optional[Any] = None,
        mesh_axis: str = "sv",
    ) -> None:
        """``mesh``: a ``jax.sharding.Mesh`` — the circuit then executes on
        the multi-chip sharded-statevector engine (state split over the
        mesh's ``mesh_axis``; see ``parallel/sharded_state.py`` for the
        memory/communication model).  A capability the reference lacks (its
        distribution is slicing-only, ``experimental.py:760-1249``)."""
        if mps_inputs is not None:
            # densify MPS input (tensors, center) — small-n convenience
            inputs = _mps_to_dense(mps_inputs)
        super().__init__(nqubits, inputs=inputs, dim=dim)
        self._split = split
        if mesh is not None:
            if dim != 2:
                raise ValueError("the sharded engine supports qubits (dim=2) only")
            from ..parallel.sharded_state import ShardedStatevec

            self._mesh_engine = ShardedStatevec(nqubits, mesh, axis=mesh_axis)

    # ------------------------------------------------------------------
    # post-selection & conditional logic
    # ------------------------------------------------------------------

    def mid_measurement(self, index: int, keep: Union[int, Tensor] = 0) -> None:
        """Post-select ``index`` onto outcome ``keep`` WITHOUT renormalization.

        Reference ``circuit.py:196-226`` (note: recorded with a dedicated name
        so exporters can skip it; the reference does not record it at all).
        """
        sel = jax.nn.one_hot(keep, self._d, dtype=jnp.dtype(config.dtypestr()))
        g = Gate(jnp.diag(sel), name="mid_measurement")
        self.apply_general_gate(g, index, name="mid_measurement")

    post_select = mid_measurement
    mid_measure = mid_measurement

    def cond_measurement(self, index: int, status: Optional[Tensor] = None) -> Tensor:
        """Projective Z measurement with renormalized collapse; returns outcome.

        Jittable via ``status`` (reference ``basecircuit.py:1723-1754``).
        """
        d = self._d
        projs = []
        for v in range(d):
            m = np.zeros((d, d))
            m[v, v] = 1.0
            projs.append(m)
        return self.general_kraus(projs, index, status=status, name="cond_measurement")

    cond_measure = cond_measurement

    # select_gate / conditional_gate live on BaseCircuit (shared with the
    # DM engine)

    # ------------------------------------------------------------------
    # Monte-Carlo noise channels
    # ------------------------------------------------------------------

    def unitary_kraus(
        self,
        kraus: Sequence[Any],
        *index: int,
        prob: Optional[Sequence[float]] = None,
        status: Optional[Tensor] = None,
        name: Optional[str] = None,
    ) -> Tensor:
        """Trajectory sampling of a unitary Kraus channel; returns branch index.

        When ``prob is None`` the probabilities are tr(K†K)/dim and operators
        are renormalized (reference ``circuit.py:459-480``); branch selection
        is cumulative-sum arithmetic on ``status`` so the whole op is jit- and
        vmap-safe (``:486-509``).
        """
        mats = self._kraus_mats(kraus, index)
        orig_mats = mats
        dim = mats[0].shape[0]
        if prob is None:
            probs = []
            new_mats = []
            for m in mats:
                p_i = jnp.real(jnp.trace(jnp.conj(m.T) @ m)) / dim
                probs.append(p_i)
                new_mats.append(
                    m
                    / jnp.sqrt(p_i.astype(m.dtype) + jnp.asarray(1e-30, dtype=m.dtype))
                )
            p = jnp.stack(probs)
            mats = new_mats
        else:
            p = jnp.asarray(prob).astype(jnp.dtype(config.rdtypestr()))
        p = p / jnp.sum(p)
        return self._apply_selected_kraus(
            mats, p, index, status=status, name=name or "unitary_kraus",
            orig_mats=orig_mats,
        )

    def general_kraus(
        self,
        kraus: Sequence[Any],
        *index: int,
        status: Optional[Tensor] = None,
        with_prob: bool = False,
        name: Optional[str] = None,
    ) -> Any:
        """Trajectory sampling of a general Kraus channel.

        Outcome probabilities are ⟨psi|K†K|psi⟩ on the *current* state
        (reference ``circuit.py:533-558``); the selected operator is applied
        renormalized, so the trajectory stays normalized.
        """
        mats = self._kraus_mats(kraus, index)
        psi = self.state()
        nrm2 = jnp.real(jnp.vdot(psi, psi))
        probs = []
        for m in mats:
            phi = statevec.apply_unitary(psi, m, index, self._d)
            probs.append(jnp.real(jnp.vdot(phi, phi)) / nrm2)
        p = jnp.stack(probs)
        p = p / jnp.sum(p)
        new_mats = [
            m / jnp.sqrt(pi.astype(m.dtype) + jnp.asarray(1e-30, dtype=m.dtype))
            for m, pi in zip(mats, p)
        ]
        idx = self._apply_selected_kraus(
            new_mats, p, index, status=status, name=name or "general_kraus",
            orig_mats=mats,
        )
        if with_prob:
            return idx, p
        return idx

    apply_general_kraus = general_kraus

    def _kraus_mats(self, kraus: Sequence[Any], index: Sequence[int]) -> List[Tensor]:
        dim = self._d ** len(index)
        mats = []
        for k1 in kraus:
            m = k1.tensor if isinstance(k1, Gate) else jnp.asarray(k1)
            m = jnp.reshape(m.astype(jnp.dtype(config.dtypestr())), (dim, dim))
            mats.append(m)
        return mats

    def _apply_selected_kraus(
        self,
        mats: List[Tensor],
        p: Tensor,
        index: Sequence[int],
        status: Optional[Tensor] = None,
        name: str = "kraus",
        orig_mats: Optional[List[Tensor]] = None,
    ) -> Tensor:
        if status is None:
            status = K.implicit_randu([])
        status = jnp.asarray(status)
        cdf = jnp.cumsum(p)
        r = jnp.reshape(status, ()).astype(cdf.dtype)
        idx = jnp.searchsorted(cdf, r + BaseCircuit._MEASURE_EPS, side="left")
        idx = jnp.clip(idx, 0, len(mats) - 1)
        onehot = jax.nn.one_hot(idx, len(mats), dtype=mats[0].dtype)
        op = sum(onehot[i] * mats[i] for i in range(len(mats)))
        g = Gate(op, name=name)
        ir_dict = {
            "gatef": None,
            "gate": g,
            "index": tuple(int(i) for i in index),
            "name": name,
            "split": None,
            "mpo": False,
            "is_channel": True,
            # original (unnormalized) Kraus set: exact replay (DMCircuit,
            # detector trajectories) recomputes branch probabilities from it
            "channel_kraus": orig_mats if orig_mats is not None else mats,
            "channel_status": status,
        }
        self.apply_general_gate(g, *index, name=name, ir_dict=ir_dict)
        return idx

    # channel convenience methods (reference _meta_apply_channels
    # circuit.py:655-683): c.depolarizing(0, px=..., ...) does MC trajectory
    @classmethod
    def _meta_apply_channels(cls) -> None:
        def make_method(cname: str, factory: Callable[..., Any]) -> Callable[..., Tensor]:
            def method(self: "Circuit", *index: int, status: Optional[Tensor] = None, **params: Any) -> Tensor:
                kraus = factory(**params)
                if getattr(kraus, "is_unitary", False):
                    return self.unitary_kraus(kraus, *index, status=status, name=cname)
                return self.general_kraus(kraus, *index, status=status, name=cname)

            method.__name__ = cname
            method.__doc__ = f"Monte-Carlo trajectory application of the {cname} channel."
            return method

        for cname, factory in channels_mod.CHANNEL_NAMES.items():
            setattr(cls, cname, make_method(cname, factory))

    def depolarizing2(self, *index: int, px: float = 0, py: float = 0, pz: float = 0, status: Optional[Tensor] = None) -> Tensor:
        """Alias of ``depolarizing`` kept for reference parity."""
        return self.depolarizing(*index, px=px, py=py, pz=pz, status=status)  # type: ignore

    # ------------------------------------------------------------------
    # circuit unitary
    # ------------------------------------------------------------------

    def matrix(self) -> Tensor:
        """The full circuit unitary as a (d^n, d^n) matrix.

        Dense-engine version of the reference's MPS-identity trick
        (``circuit.py:744-769``): apply the QIR to an identity "state" with n
        extra open input legs.
        """
        n = self._nqubits
        d = self._d
        psi = jnp.reshape(jnp.eye(d**n, dtype=jnp.dtype(config.dtypestr())), (-1,))
        for item in self._expanded_qir():
            # identity "state" has 2n slots; gates act on the first n
            psi = statevec.apply_unitary(psi, item["gate"].tensor, item["index"], d)
        return jnp.reshape(psi, (d**n, d**n))

    def get_unitary(self) -> Tensor:
        return self.matrix()

    # ------------------------------------------------------------------

    def to_dm_circuit(self) -> Any:
        from .densitymatrix import DMCircuit

        dmc = DMCircuit(self._nqubits, inputs=self._inputs, dim=self._d)
        dmc.append_from_qir(self.to_qir())
        return dmc

    # ------------------------------------------------------------------
    # reference-parity methods (circuit.py:291-830)
    # ------------------------------------------------------------------

    def unitary_kraus2(
        self,
        kraus: Sequence[Any],
        *index: int,
        prob: Optional[Sequence[float]] = None,
        status: Optional[Tensor] = None,
        name: Optional[str] = None,
    ) -> Tensor:
        """``unitary_kraus`` variant selecting the branch via ``lax.switch``.

        Reference ``circuit.py:349-404``; documented there as vmap-unsafe —
        prefer :meth:`unitary_kraus` (the onehot-sum path).
        """
        mats = self._kraus_mats(kraus, index)
        dim = mats[0].shape[0]
        if prob is None:
            probs, new_mats = [], []
            for m in mats:
                p_i = jnp.real(jnp.trace(jnp.conj(m.T) @ m)) / dim
                probs.append(p_i)
                new_mats.append(m / jnp.sqrt(p_i.astype(m.dtype) + 1e-30))
            p = jnp.stack(probs)
            mats = new_mats
        else:
            p = jnp.asarray(prob).astype(jnp.dtype(config.rdtypestr()))
        p = p / jnp.sum(p)
        if status is None:
            status = K.implicit_randu([])
        r = jnp.asarray(status).astype(p.dtype)
        cdf = jnp.cumsum(p)
        idx = jnp.clip(
            jnp.searchsorted(cdf, r + 1e-12, side="left"), 0, len(mats) - 1
        ).astype(jnp.int32)
        stack = jnp.stack([jnp.asarray(m) for m in mats])
        chosen = jax.lax.switch(idx, [lambda m=m: m for m in mats])
        del stack
        self.any(*index, unitary=chosen, name=name or "unitary_kraus2")  # type: ignore
        return idx

    def depolarizing_reference(
        self,
        index: int,
        *,
        px: float,
        py: float,
        pz: float,
        status: Optional[Tensor] = None,
    ) -> Tensor:
        """Monte-Carlo depolarizing via the explicit sign trick.

        Returns the branch lookup int [0: x, 1: y, 2: z, 3: I] (reference
        ``circuit.py:291-348``); jit-safe.
        """
        if status is None:
            status = K.implicit_randu([])
        r = jnp.asarray(status).astype(jnp.dtype(config.rdtypestr()))
        step = (
            jnp.sign(r - px) + jnp.sign(r - px - py) + jnp.sign(r - px - py - pz)
        )
        which = jnp.asarray(step / 2 + 1.5, dtype=jnp.int32)
        dt = jnp.dtype(config.dtypestr())
        paulis = [
            np.array([[0, 1], [1, 0]]),
            np.array([[0, -1j], [1j, 0]]),
            np.diag([1.0, -1.0]).astype(complex),
            np.eye(2, dtype=complex),
        ]
        onehot = jax.nn.one_hot(which, 4, dtype=dt)
        op = sum(onehot[i] * jnp.asarray(paulis[i], dtype=dt) for i in range(4))
        self.any(index, unitary=op, name="depolarizing_reference")  # type: ignore
        return which

    def measure_reference(self, *index: int, with_prob: bool = False) -> Tuple[str, float]:
        """Non-jittable reference measurement: base-d string + probability.

        Reference ``circuit.py:771-830``; python RNG, for cross-checking
        :meth:`measure_jit`.
        """
        alphabet = "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZ"
        d = self._d
        psi = np.asarray(jax.device_get(self.state()))
        n = self._nqubits
        probs_full = np.abs(psi.reshape((d,) * n)) ** 2
        sample = ""
        p_tot = 1.0
        fixed: Dict[int, int] = {}
        for j in index:
            # marginalize: sum over all axes except j and fixed ones
            sl = [slice(None)] * n
            for q, v in fixed.items():
                sl[q] = v
            sub = probs_full[tuple(sl)]
            axes = tuple(
                k for k, q in enumerate(sorted(set(range(n)) - set(fixed)))
                if q != j
            )
            pj = sub.sum(axis=axes)
            pj = pj / pj.sum()
            outcome = int(np.random.choice(d, p=pj))
            sample += alphabet[outcome]
            p_tot *= float(pj[outcome])
            fixed[j] = outcome
        if with_prob:
            return sample, p_tot
        return sample, -1.0

    def is_valid(self) -> bool:
        """Sanity check of the circuit state (reference ``circuit.py:685``)."""
        try:
            psi = np.asarray(jax.device_get(self.state()))
            assert psi.size == self._d**self._nqubits
            assert np.isfinite(psi).all()
            return True
        except Exception:
            return False

    def get_quoperator(self) -> Any:
        """Circuit unitary as a lazy QuOperator (reference ``circuit.py:723``)."""
        from .. import quantum as qu

        m = self.matrix()
        dims = (self._d,) * self._nqubits
        return qu.QuOperator.from_tensor(
            jnp.reshape(m, dims + dims)
        )

    quoperator = get_quoperator
    get_circuit_as_quoperator = get_quoperator

    def replace_mps_inputs(self, mps_inputs: Any) -> None:
        """Replace the input state with (densified) MPS tensors.

        Reference ``circuit.py:133-195``; the dense engine stores flat
        states, so the MPS is contracted once (2D growth, TPU-safe).
        """
        self.replace_inputs(_mps_to_dense(mps_inputs))

    @staticmethod
    def apply_general_kraus_delayed(
        kraus: Sequence[Any], name: Optional[str] = None
    ) -> Callable[..., Any]:
        """Return an unbound method applying a fixed Kraus set (reference
        ``circuit.py:626-654``; used for channel-method registration)."""

        def apply(self: "Circuit", *index: int, status: Optional[Tensor] = None, **kws: Any) -> Tensor:
            return self.general_kraus(kraus, *index, status=status, name=name)

        return apply


Circuit._meta_apply_channels()


def _mps_to_dense(mps_inputs: Any) -> Tensor:
    """Contract (l, d, r) MPS site tensors into a flat dense state.

    Kept 2D throughout ((grown, bond) matrices) for TPU tiling.
    """
    from ..quantum import QuOperator

    if isinstance(mps_inputs, QuOperator):
        # a QuVector (e.g. from Circuit.quvector()) IS the dense state —
        # reference accepts it directly as mps_inputs (test_circuit.py:692)
        return jnp.reshape(mps_inputs.eval(), (-1,))
    if hasattr(mps_inputs, "tensors"):
        tensors = mps_inputs.tensors
    else:
        tensors = mps_inputs
    psi = None
    for t in tensors:
        t = jnp.asarray(t)
        l, d, r = t.shape
        if psi is None:
            psi = jnp.reshape(t, (l * d, r))
            if l == 1:
                psi = jnp.reshape(t, (d, r))
        else:
            psi = psi @ jnp.reshape(t, (l, d * r))  # (grown, d*r)
            psi = jnp.reshape(psi, (-1, r))
    return jnp.reshape(psi, (-1,))


def expectation(
    *ops: Tuple[Any, Sequence[int]],
    ket: Tensor,
    bra: Optional[Tensor] = None,
    conj: bool = True,
    normalization: bool = False,
) -> Tensor:
    """Free-function expectation ⟨bra|ops|ket⟩ on dense states.

    Reference ``circuit.py:920-1065``.
    """
    cdt = jnp.dtype(config.dtypestr())
    psi = jnp.reshape(jnp.asarray(ket), (-1,))
    if not jnp.issubdtype(psi.dtype, jnp.complexfloating):
        # a real ket must not drag complex operators down to its dtype
        psi = psi.astype(cdt)
    bra_t = psi if bra is None else jnp.reshape(jnp.asarray(bra), (-1,)).astype(psi.dtype)
    phi = psi
    for op, wires in ops:
        if isinstance(op, Gate):
            op = op.tensor
        if not hasattr(wires, "__len__"):
            wires = [wires]
        phi = statevec.apply_unitary(phi, jnp.asarray(op).astype(phi.dtype), list(wires))
    bra_flat = jnp.conj(bra_t) if conj else bra_t
    val = jnp.sum(bra_flat * phi)
    if normalization:
        nrm = jnp.sqrt(
            jnp.real(jnp.vdot(psi, psi)) * jnp.real(jnp.vdot(bra_t, bra_t))
        )
        val = val / nrm.astype(val.dtype)
    return val
