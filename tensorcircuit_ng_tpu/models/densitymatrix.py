"""``DMCircuit``: exact density-matrix simulator with exact channels.

Counterpart of reference ``densitymatrix.py``: the reference keeps a doubled
tensor network (``DMCircuit2`` keeps Kraus ops lazily in the network,
``densitymatrix.py:397-465``); on the dense TPU engine ρ is a ``(d,)*2n``
tensor (ket legs then bra legs) and channels are applied exactly as
Σ_k K ρ K† — one fused XLA program under jit.  ``DMCircuit2`` is an alias:
with eager dense execution the lazy/eager distinction disappears.
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

Tensor = Any

__all__ = ["DMCircuit", "DMCircuit2", "DensityMatrixCircuit"]


class DMCircuit(BaseCircuit):
    is_dm = True

    def __init__(
        self,
        nqubits: int,
        inputs: Optional[Tensor] = None,
        dminputs: Optional[Tensor] = None,
        mps_inputs: Optional[Any] = None,
        dim: int = 2,
    ) -> None:
        super().__init__(nqubits, inputs=inputs, dim=dim)
        self._dminputs = dminputs

    def _copy_params(self) -> Dict[str, Any]:
        return {
            "nqubits": self._nqubits,
            "inputs": self._inputs,
            "dminputs": self._dminputs,
            "dim": self._d,
        }

    # ------------------------------------------------------------------
    # state computation
    # ------------------------------------------------------------------

    def _initial_dm(self) -> Tensor:
        n = self._nqubits
        d = self._d
        if self._dminputs is not None:
            rho = jnp.asarray(self._dminputs).astype(jnp.dtype(config.dtypestr()))
            return jnp.reshape(rho, (-1,))
        psi = statevec.init_state(n, d=d, inputs=self._inputs)
        rho = jnp.outer(psi, jnp.conj(psi))
        return jnp.reshape(rho, (-1,))

    def _apply_unitary_rho(self, rho: Tensor, g: Tensor, wires: Sequence[int]) -> Tensor:
        # rho is flat with 2n slots: ket legs [0, n), bra legs [n, 2n)
        n = self._nqubits
        g = statevec._as_nd(g)  # numpy stays numpy (axon complex-constant rule)
        rho = statevec.apply_unitary(rho, g, list(wires), self._d)
        rho = statevec.apply_unitary(rho, g.conj(), [w + n for w in wires], self._d)
        return rho

    def _apply_diagonal_rho(self, rho: Tensor, diag: Tensor, wires: Sequence[int]) -> Tensor:
        """Diagonal-gate fast path: two broadcast multiplies, no einsum.

        The reference's hyperedge/CopyNode diagonal path specialized to the
        doubled network (U rho U† with U diagonal = d ⊙ rho ⊙ d̄).
        """
        n = self._nqubits
        diag = statevec._as_nd(diag)
        rho = statevec.apply_diagonal(rho, diag, list(wires), self._d)
        rho = statevec.apply_diagonal(rho, diag.conj(), [w + n for w in wires], self._d)
        return rho

    def _apply_kraus_rho(
        self, rho: Tensor, kraus: Sequence[Tensor], wires: Sequence[int]
    ) -> Tensor:
        acc = None
        for k1 in kraus:
            term = self._apply_unitary_rho(rho, k1, wires)
            acc = term if acc is None else acc + term
        return acc

    def _compute_state(self) -> Tensor:
        rho = self._initial_dm()
        # expand fused-layer items: the DM doubling needs per-gate tensors
        for item in self._expanded_qir():
            if item.get("cond_collapse"):
                rho = self._collapse_rho(rho, item["index"][0], item["status"])
            elif item.get("multicz"):
                n = self._nqubits
                rho = statevec.apply_multicz(rho, item["index"])
                rho = statevec.apply_multicz(rho, [w + n for w in item["index"]])
            elif item.get("zstring_rot"):
                n = self._nqubits
                th = item["theta"]
                rho = statevec.apply_zstring_phase(rho, item["index"], th)
                # bra side conjugates: exp(+i theta/2 Z...Z)
                rho = statevec.apply_zstring_phase(
                    rho, [w + n for w in item["index"]], -th
                )
            elif item.get("is_channel"):
                mats = [
                    statevec._as_nd(m).astype(rho.dtype) for m in item["channel_kraus"]
                ]
                rho = self._apply_kraus_rho(rho, mats, item["index"])
            elif item.get("diagonal"):
                dim = self._d ** len(item["index"])
                t = statevec._as_nd(item["gate"].tensor)
                diag = np.diagonal(t.reshape(dim, dim)) if isinstance(t, np.ndarray) else jnp.diagonal(t.reshape(dim, dim))
                rho = self._apply_diagonal_rho(rho, diag, item["index"])
            else:
                rho = self._apply_unitary_rho(rho, item["gate"].tensor, item["index"])
        return rho

    def densitymatrix(self, check: bool = False, reuse: bool = True) -> Tensor:
        """ρ as a (d^n, d^n) matrix (reference ``densitymatrix.py:279``)."""
        rho = self.state(reuse=reuse)
        dim = self._d**self._nqubits
        return jnp.reshape(rho, (dim, dim))

    def state(self, form: str = "default", reuse: bool = True) -> Tensor:
        import jax.core as _core

        # trace-aware cache, same rationale as BaseCircuit.state
        token = _core.get_opaque_trace_state()
        cached = self._state_cache
        if cached is not None and reuse and cached[0] == token:
            s = cached[1]
        else:
            s = self._compute_state()
            if reuse:
                self._state_cache = (token, s)
        if form == "flat":
            return s
        dim = self._d**self._nqubits
        return jnp.reshape(s, (dim, dim))

    def wavefunction(self, form: str = "default") -> Tensor:
        """Dominant eigenvector (valid for pure ρ; reference ``:302``)."""
        rho = self.densitymatrix()
        e, v = jnp.linalg.eigh(rho)
        psi = v[:, -1] * jnp.sqrt(e[-1]).astype(v.dtype)
        return psi

    def purity(self) -> Tensor:
        rho = self.densitymatrix()
        return jnp.real(jnp.trace(rho @ rho))

    def amplitude(self, l: Union[str, Sequence[int], Tensor]) -> Tensor:
        r"""⟨l|ρ|l⟩ — the diagonal probability of basis string ``l``.

        Reference semantics (``test_dmcircuit.py:401``: the DM 'amplitude' is
        the probability, 0.5 → 0.4 under depolarizing); jittable with a
        traced digit tensor.
        """
        if isinstance(l, str):
            l = [int(ch, 36) for ch in l]
        lv = jnp.reshape(jnp.asarray(l), (-1,)).astype(jnp.int32)
        n = self._nqubits
        # int32 is ample: the dense DM engine caps far below n=31
        powers = jnp.asarray(
            [self._d ** (n - 1 - i) for i in range(n)], dtype=jnp.int32
        )
        idx = jnp.sum(lv * powers)
        rho = self.densitymatrix()
        return rho[idx, idx]

    def _site_marginal(self, rho: Tensor, q: int) -> Tensor:
        """(d,) diagonal marginal of site ``q``."""
        n = self._nqubits
        d = self._d
        dim = d**n
        p = jnp.real(jnp.diagonal(jnp.reshape(rho, (dim, dim))))
        p = jnp.reshape(p, (d**q, d, dim // d ** (q + 1)))
        return jnp.sum(p, axis=(0, 2))

    def _collapse_rho(self, rho: Tensor, q: int, status: Optional[Tensor]) -> Tensor:
        """Projective Z collapse on site ``q``: Π_v ρ Π_v / p_v."""
        n = self._nqubits
        d = self._d
        dim = d**n
        rho2 = jnp.reshape(rho, (dim, dim))
        p = self._site_marginal(rho2, q)
        p = p / jnp.sum(p)
        st = jnp.asarray(0.5 if status is None else status)
        v = jnp.searchsorted(jnp.cumsum(p), st.astype(p.dtype))
        v = jnp.clip(v, 0, d - 1)
        mask = jax.nn.one_hot(v, d, dtype=rho2.dtype)
        a = d**q
        b = dim // (a * d)
        r6 = jnp.reshape(rho2, (a, d, b, a, d, b))
        r6 = r6 * mask[None, :, None, None, None, None]
        r6 = r6 * mask[None, None, None, None, :, None]
        rho2 = jnp.reshape(r6, (dim, dim))
        tr = jnp.trace(rho2)
        rho2 = rho2 / (tr + jnp.asarray(1e-12).astype(tr.dtype))
        # hand back the engine's internal (flat doubled-space) representation
        return jnp.reshape(rho2, jnp.shape(rho))

    def cond_measurement(self, index: int, status: Optional[Tensor] = None) -> Tensor:
        """Projective Z measurement with exact renormalized collapse on ρ;
        returns the outcome (reference ``basecircuit.py:1723-1754`` role on
        the DM engine).  Jittable via ``status``."""
        q = int(index) % self._nqubits
        # outcome from the CURRENT state (the lazy recomputation makes the
        # same deterministic choice from the same status)
        p = self._site_marginal(self.densitymatrix(), q)
        p = p / jnp.sum(p)
        st = jnp.asarray(0.5 if status is None else status)
        v = jnp.clip(jnp.searchsorted(jnp.cumsum(p), st.astype(p.dtype)), 0, self._d - 1)
        self._qir.append(
            {
                "gatef": None,
                "gate": None,
                "index": (q,),
                "name": "cond_measurement",
                "split": None,
                "mpo": False,
                "cond_collapse": True,
                "status": st,
                # replay (copy/compose/from_qir) re-dispatches by name with
                # these kwargs — without them the collapse branch is lost
                "parameters": {"status": st},
            }
        )
        self._state_cache = None
        return v

    cond_measure = cond_measurement

    def projected_subsystem(self, traceout: Tensor, left: Sequence[int]) -> Tensor:
        """Reduced ρ on sites in ``left`` after projecting the complement
        onto the per-site digits in ``traceout`` (reference
        ``basecircuit.py:1823``, DM branch — trace-normalized)."""
        left = tuple(int(q) for q in left)
        tv = jnp.reshape(jnp.asarray(traceout), (-1,)).astype(jnp.int32)
        n = self._nqubits
        d = self._d
        rho = self.densitymatrix()
        m = n
        for q in sorted((q for q in range(n) if q not in left), reverse=True):
            dim = d**m
            a = d**q
            b = d ** (m - 1 - q)
            r4 = jnp.reshape(rho, (a, d, b, a, d, b))
            rho = jnp.reshape(
                r4[:, tv[q], :, :, tv[q], :], (dim // d, dim // d)
            )
            m -= 1
        tr = jnp.trace(rho)
        return rho / (tr + jnp.asarray(1e-10).astype(tr.dtype))

    @staticmethod
    def check_density_matrix(dm: Tensor) -> None:
        """Raise unless trace(dm) ≈ 1 (reference ``densitymatrix.py:370``)."""
        tr = complex(np.asarray(jax.device_get(jnp.trace(jnp.asarray(dm)))))
        if not np.allclose(tr, 1.0, atol=1e-5):
            raise ValueError(
                f"input is not a valid density matrix: trace={tr} (expected 1.0)"
            )

    @staticmethod
    def check_kraus(kraus: Sequence[Any]) -> bool:
        """Completeness check Σ K†K = I (reference ``densitymatrix.py:195``)."""
        from ..ops import channels as channels_mod

        channels_mod.kraus_identity_check(kraus)
        return True

    def get_dm_as_quoperator(self) -> Any:
        """Output ρ as a QuOperator (reference ``densitymatrix.py:320``)."""
        from .. import quantum as qu

        rho = self.densitymatrix()
        dims = (self._d,) * self._nqubits
        return qu.QuOperator.from_tensor(jnp.reshape(rho, dims + dims))

    @staticmethod
    def apply_general_kraus_delayed(
        kraus: Sequence[Any], name: Optional[str] = None
    ) -> Any:
        """Unbound method applying a fixed Kraus set exactly (reference :246)."""

        def apply(self: "DMCircuit", *index: int, **kws: Any) -> None:
            self.apply_general_kraus(kraus, *index, name=name)

        return apply

    def to_circuit(self) -> Any:
        """Pure-state circuit replaying the unitary part (reference ``:377``)."""
        from .circuit import Circuit

        c = Circuit(self._nqubits, inputs=self._inputs, dim=self._d)
        for item in self._qir:
            if not item.get("is_channel"):
                c._apply_qir_item(item)
        return c

    # ------------------------------------------------------------------
    # channels: exact application
    # ------------------------------------------------------------------

    def apply_general_kraus(
        self, kraus: Sequence[Any], *index: Any, name: Optional[str] = None, **kws: Any
    ) -> None:
        """Exact channel application Σ_k K ρ K† (reference ``:397-428``).

        ``index`` accepts flat ints, a sequence, or the reference's list of
        site tuples (``apply_general_kraus(kraus, [(1,)])``).
        """

        def _flatten(idx: Any) -> List[int]:
            out: List[int] = []
            for i in idx:
                if isinstance(i, (list, tuple)):
                    out.extend(_flatten(i))
                else:
                    out.append(int(i))
            return out

        index = tuple(i % self._nqubits for i in _flatten(index))
        dim = self._d ** len(index)
        mats = []
        for k1 in kraus:
            m = k1.tensor if isinstance(k1, Gate) else jnp.asarray(k1)
            mats.append(jnp.reshape(m.astype(jnp.dtype(config.dtypestr())), (dim, dim)))
        g = Gate(mats[0], name=name or "channel")
        ir_dict = {
            "gatef": None,
            "gate": g,
            "index": index,
            "name": name or "channel",
            "split": None,
            "mpo": False,
            "is_channel": True,
            "channel_kraus": mats,
        }
        self._qir.append(ir_dict)
        self._state_cache = None

    general_kraus = apply_general_kraus

    def unitary_kraus(
        self,
        kraus: Sequence[Any],
        *index: int,
        prob: Optional[Sequence[float]] = None,
        status: Optional[Tensor] = None,
        name: Optional[str] = None,
    ) -> Tensor:
        """Exact mixed-unitary channel; prob scales the Kraus set."""
        if prob is not None:
            mats = []
            for p, k1 in zip(prob, kraus):
                m = k1.tensor if isinstance(k1, Gate) else jnp.asarray(k1)
                mats.append(jnp.sqrt(jnp.asarray(p)).astype(jnp.dtype(config.dtypestr())) * m)
            kraus = mats
        self.apply_general_kraus(kraus, *index, name=name or "unitary_kraus")
        return jnp.asarray(-1)

    @classmethod
    def _meta_apply_channels(cls) -> None:
        def make_method(cname: str, factory: Callable[..., Any]) -> Callable[..., None]:
            def method(self: "DMCircuit", *index: int, status: Optional[Tensor] = None, **params: Any) -> None:
                kraus = factory(**params)
                self.apply_general_kraus(kraus, *index, name=cname)

            method.__name__ = cname
            method.__doc__ = f"Exact application of the {cname} channel on the density matrix."
            return method

        for cname, factory in channels_mod.CHANNEL_NAMES.items():
            setattr(cls, cname, make_method(cname, factory))

    # ------------------------------------------------------------------
    # measurement / expectation on ρ
    # ------------------------------------------------------------------

    def probability(self) -> Tensor:
        rho = self.densitymatrix()
        return jnp.real(jnp.diagonal(rho))

    def measure_jit(
        self, *index: int, with_prob: bool = False, status: Optional[Tensor] = None
    ) -> Tuple[Tensor, Tensor]:
        """Projective measurement from the diagonal distribution."""
        n = len(index)
        if status is None:
            status = K.implicit_randu([n])
        p_full = self.probability()
        p = p_full / jnp.sum(p_full)
        outcomes = []
        prob = jnp.ones((), dtype=p_full.dtype)
        for k, q in enumerate(index):
            # p is a prob vector (not amplitudes): marginal by plain sums
            a = self._d**q
            b = self._d ** (self._nqubits - 1 - q)
            marg = jnp.sum(jnp.reshape(p, (a, self._d, b)), axis=(0, 2))
            marg = marg / jnp.sum(marg)
            cdf = jnp.cumsum(marg)
            r = status[k].astype(cdf.dtype)
            outcome = jnp.clip(
                jnp.searchsorted(cdf, r + self._MEASURE_EPS, side="left"),
                0,
                self._d - 1,
            )
            p_out = marg[outcome]
            sel = jax.nn.one_hot(outcome, self._d, dtype=p.dtype)
            p = statevec.apply_diagonal(p, sel, [q], self._d)
            p = p / jnp.sum(p)
            outcomes.append(outcome)
            prob = prob * p_out
        sample = jnp.stack(outcomes).astype(jnp.int32)
        if with_prob:
            return sample, prob
        return sample, jnp.asarray(-1.0)

    def expectation(
        self,
        *ops: Tuple[Any, Sequence[int]],
        reuse: bool = True,
        noise_conf: Optional[Any] = None,
        nmc: int = 1000,
        status: Optional[Tensor] = None,
        **kws: Any,
    ) -> Tensor:
        """tr(ρ O_1 O_2 ...) exactly."""
        if noise_conf is not None:
            from .. import noisemodel

            return noisemodel.expectation_noisfy(
                self, *ops, noise_conf=noise_conf, nmc=nmc, status=status, **kws
            )
        rho = self.state(form="flat", reuse=reuse)
        n = self._nqubits
        phi = rho
        for op in ops:
            o, wires = op
            if isinstance(o, Gate):
                o = o.tensor
            if not hasattr(wires, "__len__"):
                wires = [wires]
            phi = statevec.apply_unitary(
                phi, jnp.asarray(o).astype(phi.dtype), [int(w) % n for w in wires], self._d
            )
        dim = self._d**n
        return jnp.trace(jnp.reshape(phi, (dim, dim)))


DMCircuit._meta_apply_channels()


class DMCircuit2(DMCircuit):
    """DMCircuit whose expectations contract the doubled network lazily.

    Reference ``densitymatrix.py:398-430`` keeps Kraus superoperators in the
    lazy tn graph so a noisy *expectation* on a wide shallow circuit is a
    planned contraction, never a d^2n density matrix.  Here
    :meth:`expectation_before` lowers the QIR to
    ``einsum_ir.superop_expectation_ir`` (channels as superoperator tensors,
    light-cone pruned), and :meth:`expectation` routes through it above
    ``_DENSE_MAX_QUBITS_DM`` qubits — e.g. 24-qubit depth-4 noisy
    expectations run in milliseconds where the dense path would need a
    2^48-element rho.
    """

    #: above this qubit count expectation() bypasses the dense rho
    _DENSE_MAX_QUBITS_DM = 14

    def expectation_before(
        self, *ops: Tuple[Any, Sequence[int]], enable_lightcone: bool = True
    ) -> Any:
        from ..core import einsum_ir as _eir

        n = self._nqubits
        norm_ops = []
        for op in ops:
            o, wires = op
            if isinstance(o, Gate):
                o = o.tensor
            if not hasattr(wires, "__len__"):
                wires = [wires]
            norm_ops.append((statevec._as_nd(o), [int(w) % n for w in wires]))
        return _eir.superop_expectation_ir(
            self._expanded_qir(), n, norm_ops, d=self._d, lightcone=enable_lightcone
        )

    def expectation(
        self,
        *ops: Tuple[Any, Sequence[int]],
        reuse: bool = True,
        noise_conf: Optional[Any] = None,
        nmc: int = 1000,
        status: Optional[Tensor] = None,
        enable_lightcone: bool = True,
        **kws: Any,
    ) -> Tensor:
        if noise_conf is not None or self._nqubits <= self._DENSE_MAX_QUBITS_DM:
            return DMCircuit.expectation(
                self,
                *ops,
                reuse=reuse,
                noise_conf=noise_conf,
                nmc=nmc,
                status=status,
                **kws,
            )
        from ..core import contractor as _ctr

        return _ctr.contract_ir(
            self.expectation_before(*ops, enable_lightcone=enable_lightcone)
        )

    # ------------------------------------------------------------------
    # lazy sampling / probability / amplitude above the dense cliff
    # (reference basecircuit.py:449-560,626 serves these from the doubled
    # network; here via einsum_ir.superop_boundary_ir)
    # ------------------------------------------------------------------

    # basecircuit.sample() cliff: a DM holds d^2n entries, so the dense
    # path must stop at half the pure-state width
    _DENSE_MAX_QUBITS = _DENSE_MAX_QUBITS_DM

    def _boundary_ir(self, **kws: Any) -> Any:
        from ..core import einsum_ir as _eir

        return _eir.superop_boundary_ir(
            self._expanded_qir(), self._nqubits, d=self._d, **kws
        )

    def probability(self, *index: int) -> Tensor:
        """Diagonal of ρ, or the joint diagonal marginal of ``index`` wires.

        With no arguments below the cliff this is the dense diagonal
        (reference semantics); with wires given — or above the cliff — it
        is a planned light-cone contraction of the doubled network and
        never materializes ρ.  Marginals of a few wires on a wide shallow
        noisy circuit cost milliseconds at any n.
        """
        from ..core import contractor as _ctr

        if not index:
            if self._nqubits <= self._DENSE_MAX_QUBITS_DM:
                return DMCircuit.probability(self)
            index = tuple(range(self._nqubits))
        p = _ctr.contract_ir(self._boundary_ir(diag_wires=list(index)))
        return jnp.real(jnp.reshape(p, (-1,)))

    def measure_jit(
        self, *index: int, with_prob: bool = False, status: Optional[Tensor] = None
    ) -> Tuple[Tensor, Tensor]:
        """Autoregressive projective measurement without materializing ρ.

        Per measured qubit one light-cone contraction yields the d-outcome
        conditional marginal (previous outcomes enter as traced one-hot
        boundary vectors, so the whole chain jits); below the cliff the
        dense path is kept for exact parity.
        """
        if self._nqubits <= self._DENSE_MAX_QUBITS_DM:
            return DMCircuit.measure_jit(
                self, *index, with_prob=with_prob, status=status
            )
        from ..core import contractor as _ctr

        d = self._d
        if status is None:
            status = K.implicit_randu([len(index)])
        rdt = jnp.dtype(config.rdtypestr())
        fixed: Dict[int, Tensor] = {}
        outcomes = []
        prob = jnp.ones((), dtype=rdt)
        for k, q in enumerate(index):
            marg = jnp.real(
                jnp.reshape(
                    _ctr.contract_ir(self._boundary_ir(fixed=fixed, diag_wires=[q])),
                    (d,),
                )
            )
            marg = marg / jnp.sum(marg)
            cdf = jnp.cumsum(marg)
            r = status[k].astype(cdf.dtype)
            outcome = jnp.clip(
                jnp.searchsorted(cdf, r + self._MEASURE_EPS, side="left"), 0, d - 1
            )
            prob = prob * marg[outcome]
            # real one-hot boundary: conditioning projector |v><v| (kept
            # real so no complex value ever crosses a jit boundary on axon)
            fixed = dict(fixed)
            fixed[q] = jax.nn.one_hot(outcome, d, dtype=rdt)
            outcomes.append(outcome)
        sample = jnp.stack(outcomes).astype(jnp.int32)
        if with_prob:
            return sample, prob
        return sample, jnp.asarray(-1.0)

    def amplitude(self, l: Union[str, Sequence[int], Tensor]) -> Tensor:
        """⟨l|ρ|l⟩; above the cliff a closed doubled-network contraction."""
        if self._nqubits <= self._DENSE_MAX_QUBITS_DM:
            return DMCircuit.amplitude(self, l)
        from ..core import contractor as _ctr

        if isinstance(l, str):
            l = [int(ch, 36) for ch in l]
        lv = jnp.reshape(jnp.asarray(l), (-1,)).astype(jnp.int32)
        rdt = jnp.dtype(config.rdtypestr())
        fixed = {
            q: jax.nn.one_hot(lv[q], self._d, dtype=rdt)
            for q in range(self._nqubits)
        }
        return _ctr.contract_ir(self._boundary_ir(fixed=fixed))


DensityMatrixCircuit = DMCircuit
