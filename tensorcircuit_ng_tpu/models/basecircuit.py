"""Dense-engine circuit layer shared by ``Circuit`` and ``DMCircuit``.

Counterpart of reference ``basecircuit.py`` (state bookkeeping, sampling,
expectation machinery) re-designed for the dense statevector engine in
:mod:`tensorcircuit_ng_tpu.core.statevec`: the state is a flat (d^n,) vector
folded over QIR under jit (see statevec docstring for the TPU layout rule),
with the reference's semantics preserved —
state caching (``basecircuit.py:375-391``), status-driven jittable sampling
(``:449-560``, ``:1402-1512``), six sample formats, readout error.
"""

from __future__ import annotations

import math

from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import numpy as np
import jax
import jax.numpy as jnp

from .. import config
from ..backend import backend as K
from ..core import statevec
from ..ops.gates import Gate
from .abstractcircuit import AbstractCircuit

Tensor = Any

__all__ = ["BaseCircuit"]


#: gates applied via the diagonal fast path (broadcast multiply, no matmul)
_DIAGONAL_GATES = frozenset(
    ["z", "s", "sd", "t", "td", "rz", "rzz", "cz", "cphase", "phase", "mid_measurement"]
)


class BaseCircuit(AbstractCircuit):
    is_dm = False

    def __init__(
        self,
        nqubits: int,
        inputs: Optional[Tensor] = None,
        dim: int = 2,
    ) -> None:
        super().__init__()
        self._nqubits = nqubits
        self._d = dim
        self._inputs = inputs
        self._state_cache: Optional[Tensor] = None

    def _copy_params(self) -> Dict[str, Any]:
        return {"nqubits": self._nqubits, "inputs": self._inputs, "dim": self._d}

    # ------------------------------------------------------------------
    # state computation
    # ------------------------------------------------------------------

    def _initial_state(self) -> Tensor:
        return statevec.init_state(self._nqubits, d=self._d, inputs=self._inputs)

    def apply_general_gate(
        self,
        gate: Union[Gate, Tensor],
        *index: int,
        name: Optional[str] = None,
        split: Optional[Dict[str, Any]] = None,
        mpo: bool = False,
        ir_dict: Optional[Dict[str, Any]] = None,
    ) -> None:
        if not isinstance(gate, Gate):
            gate = Gate(gate, name=name or "any")
        index = tuple(int(i) % self._nqubits for i in index)  # negative ok
        if len(set(index)) != len(index):
            raise ValueError(f"duplicate qubit indices in gate application: {index}")
        for i in index:
            if i >= self._nqubits:
                raise ValueError(f"qubit index {i} out of range (n={self._nqubits})")
        if ir_dict is None:
            ir_dict = {
                "gatef": None,
                "gate": gate,
                "index": index,
                "name": name or gate.name,
                "split": split,
                "mpo": mpo,
            }
        else:
            ir_dict = dict(ir_dict)
            ir_dict["index"] = index
        if (ir_dict.get("name") or "").lower() in _DIAGONAL_GATES:
            ir_dict["diagonal"] = True
        self._qir.append(ir_dict)
        self._state_cache = None  # invalidate (reference basecircuit.py:371)

    #: set by Circuit(mesh=...): the multi-chip sharded-statevector engine
    _mesh_engine: Optional[Any] = None

    def _compute_state(self) -> Tensor:
        if self._mesh_engine is not None:
            return self._mesh_engine.run_groups(self._grouped_qir(), self._inputs)
        return self._run_groups(self._grouped_qir())

    def _run_groups(self, groups: List[Any]) -> Tensor:
        psi = None
        if (
            self._inputs is None
            and self._d == 2
            and groups
            and isinstance(groups[0], dict)
            and groups[0].get("h_fold")
        ):
            # H^n |0...0> is the uniform state: fold it to a broadcast
            # constant — the h kernels AND their whole backward walk vanish
            # (the cotangent stops at a constant).  Scalar-broadcast real
            # constant, then cast: axon-safe (no complex host constants).
            dim = 2**self._nqubits
            cdt = jnp.dtype(config.dtypestr())
            rdt = jnp.float64 if cdt == jnp.complex128 else jnp.float32
            psi = jnp.full((dim,), 1.0 / math.sqrt(dim), dtype=rdt).astype(cdt)
            groups = groups[1:]
        if psi is None:
            psi = self._initial_state()
        for group in groups:
            if isinstance(group, list):  # consecutive zzrx layers, same pairs
                from ..core import kernels

                zz = jnp.stack([jnp.asarray(it["zz_thetas"]) for it in group])
                rx = jnp.stack([jnp.asarray(it["rx_thetas"]) for it in group])
                psi = kernels.fused_zzrx_multilayer(psi, group[0]["pairs"], zz, rx)
            else:
                psi = self._apply_item(psi, group)
        return psi

    def _grouped_qir(self) -> List[Any]:
        """QIR with runs of >=2 consecutive ``zzrx_layer`` items (identical
        pairs) collected into lists — the multi-layer kernel applies a whole
        run in one Pallas pass each way (kernels_multilayer)."""
        out: List[Any] = []
        run: List[Dict[str, Any]] = []

        def flush():
            nonlocal run
            if len(run) >= 2:
                out.append(run)
            else:
                out.extend(run)
            run = []

        for item in self._qir:
            if item.get("zzrx_layer"):
                key = tuple((int(a), int(b)) for a, b in item["pairs"])
                if run and tuple(
                    (int(a), int(b)) for a, b in run[0]["pairs"]
                ) != key:
                    flush()
                run.append(item)
            else:
                flush()
                out.append(item)
        flush()
        return out

    def _apply_item(self, psi: Tensor, item: Dict[str, Any]) -> Tensor:
        if item.get("rx_layer"):
            from ..core import kernels

            return kernels.fused_rx_layer(psi, item["thetas"])
        if item.get("fused_1q_layer"):
            from ..core import kernels

            return kernels.fused_single_qubit_layer(
                psi, item["gates"], constant=bool(item.get("constant"))
            )
        if item.get("zz_product"):
            return statevec.apply_zz_product_phase(psi, item["pairs"], item["thetas"])
        if item.get("zzrx_layer"):
            from ..core import kernels

            return kernels.fused_zzrx_layer(
                psi, item["pairs"], item["zz_thetas"], item["rx_thetas"]
            )
        if item.get("multicz"):
            return statevec.apply_multicz(psi, item["index"])
        if item.get("zstring_rot"):
            return statevec.apply_zstring_phase(psi, item["index"], item["theta"])
        k = len(item["index"])
        if item.get("diagonal"):
            dim = self._d**k
            diag = jnp.diagonal(jnp.reshape(item["gate"].tensor, (dim, dim)))
            return statevec.apply_diagonal(psi, diag, item["index"], self._d)
        return statevec.apply_unitary(psi, item["gate"].tensor, item["index"], self._d)

    def _expanded_qir(self) -> List[Dict[str, Any]]:
        """QIR with fused-layer items expanded to plain per-gate dicts.

        Used by paths that need one-tensor-per-gate structure (matrix(),
        einsum IR lowering, inverse, translation).
        """
        out: List[Dict[str, Any]] = []
        for item in self._qir:
            if item.get("rx_layer"):
                from ..ops.gates import rx_matrix

                for q in range(self._nqubits):
                    out.append(
                        {
                            "gatef": None,
                            "gate": Gate(rx_matrix(item["thetas"][q]), name="rx"),
                            "index": (q,),
                            "name": "rx",
                            "parameters": {"theta": item["thetas"][q]},
                            "split": None,
                            "mpo": False,
                            "diagonal": False,
                        }
                    )
            elif item.get("zstring_rot"):
                k = len(item["index"])
                if k <= 8:
                    from ..ops.gates import rzm_diagonal

                    diag = rzm_diagonal(
                        item["theta"], k, np.dtype(config.dtypestr())
                    )
                    m = np.diag(diag) if isinstance(diag, np.ndarray) else jnp.diag(diag)
                    out.append(
                        {
                            "gatef": None,
                            "gate": Gate(m, name="rzm"),
                            "index": item["index"],
                            "name": "rzm",
                            "split": None,
                            "mpo": False,
                            "diagonal": True,
                        }
                    )
                else:
                    out.append(dict(item))
            elif item.get("multicz"):
                k = len(item["index"])
                if k <= 8:
                    from ..ops.gates import multicontrol_matrix

                    z = np.diag([1.0, -1.0])
                    m = multicontrol_matrix(z, [1] * (k - 1))
                    out.append(
                        {
                            "gatef": None,
                            "gate": Gate(m, name="multicz"),
                            "index": item["index"],
                            "name": "multicz",
                            "split": None,
                            "mpo": False,
                            "diagonal": True,
                        }
                    )
                else:
                    # too wide to densify; IR/DM consumers must special-case
                    out.append(item)
                continue
            elif item.get("fused_1q_layer"):
                for q in range(self._nqubits):
                    out.append(
                        {
                            "gatef": None,
                            "gate": Gate(item["gates"][q], name="any"),
                            "index": (q,),
                            "name": "fused1q",
                            "split": None,
                            "mpo": False,
                            "diagonal": False,
                        }
                    )
            elif item.get("zz_product"):
                from ..ops import gates as gates_mod

                thetas = item["thetas"]
                for k, (a, b) in enumerate(item["pairs"]):
                    g = gates_mod.GATES["rzz"](theta=thetas[k])
                    out.append(
                        {
                            "gatef": gates_mod.GATES["rzz"],
                            "gate": g,
                            "index": (int(a), int(b)),
                            "name": "rzz",
                            "parameters": {"theta": thetas[k]},
                            "split": None,
                            "mpo": False,
                            "diagonal": True,
                        }
                    )
            elif item.get("zzrx_layer"):
                from ..ops import gates as gates_mod
                from ..ops.gates import rx_matrix

                zz_thetas = item["zz_thetas"]
                for k, (a, b) in enumerate(item["pairs"]):
                    g = gates_mod.GATES["rzz"](theta=zz_thetas[k])
                    out.append(
                        {
                            "gatef": gates_mod.GATES["rzz"],
                            "gate": g,
                            "index": (int(a), int(b)),
                            "name": "rzz",
                            "parameters": {"theta": zz_thetas[k]},
                            "split": None,
                            "mpo": False,
                            "diagonal": True,
                        }
                    )
                for q in range(self._nqubits):
                    out.append(
                        {
                            "gatef": None,
                            "gate": Gate(rx_matrix(item["rx_thetas"][q]), name="rx"),
                            "index": (q,),
                            "name": "rx",
                            "parameters": {"theta": item["rx_thetas"][q]},
                            "split": None,
                            "mpo": False,
                            "diagonal": False,
                        }
                    )
            else:
                out.append(item)
        return out

    # ------------------------------------------------------------------
    # fused layer application (TPU hot path; Pallas kernel when on TPU)
    # ------------------------------------------------------------------

    def multicz(self, *index: int) -> None:
        r"""Multi-controlled Z on ``index`` (k-qubit CZ hyperedge).

        Diagonal sign flip where all wires are 1 — one elementwise pass, no
        2^k matrix (reference expresses this as a cotengra hyperedge).
        """
        if len(index) == 1 and hasattr(index[0], "__len__"):
            index = tuple(index[0])  # accept multicz([0,1,2]) as well
        index = tuple(int(i) % self._nqubits for i in index)
        self._qir.append(
            {
                "gatef": None,
                "gate": None,
                "index": index,
                "name": "multicz",
                "split": None,
                "mpo": False,
                "multicz": True,
            }
        )
        self._state_cache = None

    mcz = multicz
    cmz = multicz

    def rzm(self, *index: int, theta: Any = 0.0) -> None:
        r"""exp(-i θ/2 Z⊗...⊗Z) on ``index`` — the reference's multi-qubit
        Z-string rotation (``rzm``), applied as one diagonal parity mask
        (no 2^k matrix on the dense path)."""
        if len(index) == 1 and hasattr(index[0], "__len__"):
            index = tuple(index[0])
        index = tuple(int(i) % self._nqubits for i in index)
        self._qir.append(
            {
                "gatef": None,
                "gate": None,
                "index": index,
                "name": "rzm",
                "split": None,
                "mpo": False,
                "zstring_rot": True,
                "theta": theta,
                "parameters": {"theta": theta},
            }
        )
        self._state_cache = None

    def fused_single_qubit_layer(
        self, gates: Tensor, name: str = "fused_1q_layer", constant: bool = False
    ) -> None:
        """Apply gates[q] on every qubit q in one fused pass (Pallas on TPU).

        ``constant=True`` marks non-trainable gates (e.g. h_layer): the
        backward kernel then skips per-gate cotangent reductions entirely.
        Concrete gate stacks stay numpy (axon complex-constant rule).
        """
        if not hasattr(gates, "ndim"):
            gates = np.asarray(gates)
        import jax.core as _core

        if not isinstance(gates, _core.Tracer) and isinstance(gates, np.ndarray):
            gates = gates.astype(np.dtype(config.dtypestr()))
        else:
            gates = jnp.asarray(gates).astype(jnp.dtype(config.dtypestr()))
        assert gates.shape[0] == self._nqubits
        self._qir.append(
            {
                "fused_1q_layer": True,
                "gates": gates,
                "index": tuple(range(self._nqubits)),
                "name": name,
                "constant": bool(constant),
                "split": None,
                "mpo": False,
            }
        )
        self._state_cache = None

    def rx_layer(self, thetas: Tensor) -> None:
        """rx(thetas[q]) on every qubit, fused (theta-native Pallas VJP)."""
        self._qir.append(
            {
                "gatef": None,
                "gate": None,
                "index": tuple(range(self._nqubits)),
                "name": "rx_layer",
                "split": None,
                "mpo": False,
                "rx_layer": True,
                "thetas": jnp.reshape(jnp.asarray(thetas), (-1,)),
            }
        )
        self._state_cache = None

    def ry_layer(self, thetas: Tensor) -> None:
        from ..ops.gates import ry_matrix

        gates = jax.vmap(lambda t: ry_matrix(t))(jnp.reshape(jnp.asarray(thetas), (-1,)))
        self.fused_single_qubit_layer(gates, name="ry_layer")

    def rz_layer(self, thetas: Tensor) -> None:
        from ..ops.gates import rz_matrix

        gates = jax.vmap(lambda t: rz_matrix(t))(jnp.reshape(jnp.asarray(thetas), (-1,)))
        self.fused_single_qubit_layer(gates, name="rz_layer")

    def h_layer(self) -> None:
        """Hadamard on every qubit, fused."""
        from ..ops import gates as gates_mod

        h = gates_mod.GATES["h"]().matrix()
        gates = np.broadcast_to(h, (self._nqubits, 2, 2))
        self.fused_single_qubit_layer(gates, name="h_layer", constant=True)
        # only THIS method may mark the item for the |0..0> -> uniform-state
        # fold (keying the fold on the name alone would silently replace a
        # user layer that merely reuses the name)
        self._qir[-1]["h_fold"] = True

    def rzz_product(self, pairs: Sequence[Tuple[int, int]], thetas: Tensor) -> None:
        """exp(-i/2 Σ θ_k Z_a Z_b) over all listed pairs in one fused pass."""
        self._qir.append(
            {
                "zz_product": True,
                "pairs": [(int(a), int(b)) for a, b in pairs],
                "thetas": jnp.reshape(jnp.asarray(thetas), (-1,)),
                "index": tuple(sorted({q for p_ in pairs for q in p_})),
                "name": "rzz_product",
                "split": None,
                "mpo": False,
            }
        )
        self._state_cache = None

    def zzrx_layer(
        self, pairs: Sequence[Tuple[int, int]], zz_thetas: Tensor, rx_thetas: Tensor
    ) -> None:
        """Fused TFIM layer: exp(-i/2 Σ θ_k Z_a Z_b) then rx on every qubit.

        One Pallas kernel pass for the zz phase + row rx with theta-native
        gradients (see ``core.kernels.fused_zzrx_layer``); equals
        ``rzz_product(pairs, zz_thetas)`` followed by ``rx_layer(rx_thetas)``.
        """
        self._qir.append(
            {
                "zzrx_layer": True,
                "pairs": [(int(a), int(b)) for a, b in pairs],
                "zz_thetas": jnp.reshape(jnp.asarray(zz_thetas), (-1,)),
                "rx_thetas": jnp.reshape(jnp.asarray(rx_thetas), (-1,)),
                "index": tuple(range(self._nqubits)),
                "name": "zzrx_layer",
                "split": None,
                "mpo": False,
            }
        )
        self._state_cache = None

    def mpo(self, *index: int, mpo: Any = None, name: str = "mpo") -> None:
        """Apply an MPO / QuOperator as a gate on ``index`` (densified).

        Reference MPO-gate path (``basecircuit.py:295-316``); the dense engine
        materializes the operator matrix (fine for few-site MPOs).
        """
        from .. import quantum as qu

        if isinstance(mpo, qu.QuOperator):
            m = mpo.eval_matrix()
        elif isinstance(mpo, (list, tuple)):
            m = qu.tn2qop(mpo).eval_matrix()
        else:
            m = jnp.asarray(mpo)
        self.any(*index, unitary=m, name=name)  # type: ignore

    def expectation_zz_sum(self, pairs: Sequence[Tuple[int, int]], weights: Optional[Tensor] = None) -> Tensor:
        return statevec.expectation_zz_sum(self.state(), pairs, weights)

    def expectation_x_sum(self, wires: Optional[Sequence[int]] = None) -> Tensor:
        return statevec.expectation_x_sum(self.state(), wires)

    def expectation_ising_sum(
        self,
        zz_terms: Optional[Sequence[Any]] = None,
        z_terms: Optional[Sequence[Any]] = None,
        x_terms: Any = None,
    ) -> Tensor:
        """⟨Σ w_s Π_{q∈s} Z_q + Σ w_q X_q⟩ — the Ising/spin-glass family in
        ONE fused readout.

        ``zz_terms``: ``(a, b)`` or ``(a, b, w)`` couplings; ``z_terms``:
        ``q`` / ``(q, w)`` longitudinal fields; ``x_terms``: ``q`` /
        ``(q, w)`` transverse fields, or ``True`` for a uniform field on
        every qubit.  Weights must be static Python floats.

        When the circuit ends in a run of ≥2 ``zzrx_layer`` items, the
        layers AND the readout evaluate inside a single custom-VJP boundary
        on f32 planes (the readout backward seed is saved in the forward —
        ``core.kernels_stack.zzrx_stack_energy``), skipping the complex
        state round trip entirely.  Otherwise the readout runs as real
        block sandwiches on the dense state (``kernels.ising_energy_dense``).
        """
        from ..core import kernels

        spec = kernels.ising_readout_spec(self._nqubits, zz_terms, z_terms, x_terms)
        if self._mesh_engine is not None:
            # multi-chip: one shard_map readout pass + one psum
            return self._mesh_engine.expectation_ising_sum(self.state(), spec)
        groups = self._grouped_qir()
        if self._d == 2 and groups and isinstance(groups[-1], list):
            run = groups[-1]
            psi = self._run_groups(groups[:-1])
            zz = jnp.stack([jnp.asarray(it["zz_thetas"]) for it in run])
            rx = jnp.stack([jnp.asarray(it["rx_thetas"]) for it in run])
            return kernels.fused_zzrx_multilayer_energy(
                psi, run[0]["pairs"], zz, rx, spec
            )
        return kernels.ising_energy_dense(self.state(), self._nqubits, spec)

    def expectation_zzx_energy(
        self,
        pairs: Optional[Sequence[Tuple[int, int]]] = None,
        zz_weight: float = 1.0,
        x_weight: float = 1.0,
    ) -> Tensor:
        """``zz_weight·Σ_pairs ⟨Z_a Z_b⟩ + x_weight·Σ_q ⟨X_q⟩`` fused readout.

        TFIM-shaped shorthand for :meth:`expectation_ising_sum`.
        """
        zz = [(int(a), int(b), float(zz_weight)) for a, b in (pairs or ())]
        xs = [(q, float(x_weight)) for q in range(self._nqubits)] if x_weight else None
        return self.expectation_ising_sum(zz_terms=zz, x_terms=xs)

    def state(self, form: str = "default", reuse: bool = True) -> Tensor:
        """The output state (flat); cached until the next gate application.

        ``form="tensor"`` reshapes to ``(d,)*n`` — avoid inside jit for large
        n (TPU tiling; see core/statevec.py docstring).
        """
        import jax.core as _core

        # the cache is keyed on the tracing context: a state traced under one
        # jit call must never be reused by a later trace (UnexpectedTracerError
        # when a prebuilt circuit is captured in a jitted closure and called
        # twice); within one trace reuse is safe and saves retracing
        token = _core.get_opaque_trace_state()
        cached = self._state_cache
        if cached is not None and reuse and cached[0] == token:
            s = cached[1]
        else:
            s = self._compute_state()
            if reuse:
                self._state_cache = (token, s)
        if form == "tensor":
            return jnp.reshape(s, (self._d,) * self._nqubits)
        return s

    wavefunction = state

    def select_gate(self, which: Tensor, kraus: Sequence[Any], *index: int) -> None:
        """Apply ``kraus[which]`` where ``which`` is a traced int tensor.

        Jittable classical control (reference ``abstractcircuit.py:1393-1446``);
        shared by the statevector and DM engines (the selected matrix is
        applied as a unitary gate).
        """
        from ..ops.gates import Gate as _Gate

        mats = [
            (k.tensor if isinstance(k, _Gate) else jnp.asarray(k)).astype(
                jnp.dtype(config.dtypestr())
            )
            for k in kraus
        ]
        dim = self._d ** len(index)
        mats = [jnp.reshape(m, (dim, dim)) for m in mats]
        stack = jnp.stack(mats)
        which = jnp.asarray(which).astype(jnp.int32)
        chosen = jnp.take(stack, which, axis=0)
        self.any(*index, unitary=chosen, name="select_gate")  # type: ignore

    conditional_gate = select_gate

    def quvector(self) -> Any:
        """Output state as a :class:`~.quantum.QuVector` (reference
        ``basecircuit.py:1026``; alias of :meth:`get_quvector`)."""
        return self.get_quvector()

    def replace_inputs(self, inputs: Tensor) -> None:
        """Swap the input state (reference ``basecircuit.py:1703``)."""
        self._inputs = inputs
        self._state_cache = None

    # ------------------------------------------------------------------
    # amplitudes / probabilities
    # ------------------------------------------------------------------

    #: above this qubit count the dense engine is bypassed for the einsum IR
    _DENSE_MAX_QUBITS = 30

    def amplitude(self, l: Union[str, Sequence[int], Tensor]) -> Tensor:
        r"""⟨l|psi⟩ for a basis string like ``"0101"`` (base-d, 0-9A-Z).

        Large circuits (n > 30) route through the lazy einsum IR with a
        planned (optionally sliced) contraction instead of the dense state.
        """
        if isinstance(l, str):
            l = [int(ch, 36) for ch in l]
        if self._nqubits > self._DENSE_MAX_QUBITS:
            from ..core import contractor as _ctr

            return _ctr.contract_ir(self.amplitude_before(l))
        return statevec.amplitude(self.state(), l, self._d)

    def amplitude_before(self, l: Union[str, Sequence[int]]) -> Any:
        """Einsum IR of the ⟨l|C|0⟩ network (reference ``expectation_before``-style)."""
        from ..core import einsum_ir as _eir

        if isinstance(l, str):
            l = [int(ch, 36) for ch in l]
        return _eir.amplitude_ir(self._expanded_qir(), self._nqubits, l, d=self._d)

    def expectation_before(
        self, *ops: Tuple[Any, Sequence[int]], enable_lightcone: bool = True
    ) -> Any:
        """Einsum IR of the ⟨psi|O|psi⟩ network (reference ``basecircuit.py:393-447``)."""
        from ..core import einsum_ir as _eir

        norm_ops = []
        for op in ops:
            o, wires = op
            if isinstance(o, Gate):
                o = o.tensor
            if not hasattr(wires, "__len__"):
                wires = [wires]
            norm_ops.append((jnp.asarray(o), [int(w) % self._nqubits for w in wires]))
        return _eir.expectation_ir(
            self._expanded_qir(), self._nqubits, norm_ops, d=self._d, lightcone=enable_lightcone
        )

    def probability(self) -> Tensor:
        """Unnormalized probability vector |psi|^2 (length d^n)."""
        return statevec.probabilities(self.state())

    # ------------------------------------------------------------------
    # measurement / sampling (status-driven, jittable)
    # ------------------------------------------------------------------

    _MEASURE_EPS = 0.31415926e-12  # tie-break at 0.5, reference basecircuit.py:522

    def measure_jit(
        self, *index: int, with_prob: bool = False, status: Optional[Tensor] = None
    ) -> Tuple[Tensor, Tensor]:
        """Autoregressive projective measurement of ``index`` qubits.

        Fully jittable; randomness is externalized through ``status`` (uniform
        [0,1) of shape [len(index)]) per the reference contract
        (``basecircuit.py:449-560``).  Returns (outcomes [len(index)], prob).
        """
        n = len(index)
        if status is None:
            status = K.implicit_randu([n])
        if self._mesh_engine is not None:
            return self._mesh_engine.measure_jit(
                self.state(), list(index), status=status, with_prob=with_prob
            )
        psi = self.state()
        outcomes = []
        prob = jnp.ones((), dtype=jnp.dtype(config.rdtypestr()))
        for k, q in enumerate(index):
            marg = statevec.marginal_probability(psi, [q], self._d)
            marg = marg / jnp.sum(marg)
            cdf = jnp.cumsum(marg)
            r = status[k].astype(cdf.dtype)
            outcome = jnp.searchsorted(cdf, r + self._MEASURE_EPS, side="left")
            outcome = jnp.clip(outcome, 0, self._d - 1)
            p_out = marg[outcome]
            psi = statevec.project_slot(psi, q, outcome, self._d)
            outcomes.append(outcome)
            prob = prob * jnp.real(p_out)
        sample = jnp.stack(outcomes).astype(jnp.int32)
        if with_prob:
            return sample, prob
        return sample, jnp.asarray(-1.0)

    def measure(self, *index: int, with_prob: bool = False) -> Tuple[Tensor, Tensor]:
        return self.measure_jit(*index, with_prob=with_prob)

    def perfect_sampling(self, status: Optional[Tensor] = None) -> Tuple[Tensor, Tensor]:
        """Sample all qubits once (reference ``basecircuit.py:449``)."""
        return self.measure_jit(*range(self._nqubits), with_prob=True, status=status)

    def sample(
        self,
        batch: Optional[int] = None,
        allow_state: bool = False,
        readout_error: Optional[Tensor] = None,
        format: Optional[str] = None,
        random_generator: Optional[Any] = None,
        status: Optional[Tensor] = None,
        jittable: bool = True,
        format_: Optional[str] = None,
    ) -> Any:
        """Batched sampling with the reference's six output formats.

        ``allow_state=True`` samples from the full probability vector (one
        contraction + categorical sampling — preferred ≤ ~32 qubits);
        otherwise autoregressive perfect sampling per shot (reference
        ``basecircuit.py:1402-1512``).
        """
        if format is None and format_ is not None:
            format = format_
        nbatch = 1 if batch is None else batch
        if self._mesh_engine is not None:
            # multi-chip engine: batched per-shard inverse-CDF sampling —
            # one uniform per shot, two collectives TOTAL, no 2^n gather
            if status is None:
                if random_generator is None:
                    status = K.implicit_randu([nbatch])
                else:
                    status = K.stateful_randu(random_generator, shape=[nbatch])
            status = jnp.asarray(status)
            if status.ndim == 2:
                # trajectory-convention [batch, n] status accepted too
                status = status[:, 0]
            idx = self._mesh_engine.sample_direct(self.state(), status)
            from .. import quantum as qu

            if format is None:
                bins = qu.sample_int2bin(idx, self._nqubits, self._d)
                if batch is None:
                    return bins[0], -1.0
                return [(bins[i], -1.0) for i in range(nbatch)]
            return qu.sample2all(
                idx, self._nqubits, format=format, jittable=jittable, d=self._d
            )
        if self._d**self._nqubits > 2**self._DENSE_MAX_QUBITS:
            # above the dense-memory cliff no 2^n object may exist; sample
            # autoregressively through planned light-cone contractions of
            # projector expectations (the reference degrades to
            # perfect_sampling here; its TN path is this path's role);
            # allow_state is moot here — the dense state cannot exist
            return self._sample_large_n(
                nbatch,
                batch,
                format,
                status,
                jittable,
                readout_error=readout_error,
                random_generator=random_generator,
            )
        if allow_state:
            p = self.probability()
            p = p / jnp.sum(p)
            if readout_error is not None:
                p = self.readouterror_bs(readout_error, p)
            if status is not None and jnp.asarray(status).ndim == 2:
                # accept the trajectory-path convention [batch, n] too: the
                # dense path needs one uniform per shot
                status = jnp.asarray(status)[:, 0]
            idx = K.probability_sample(nbatch, p, status=status, g=random_generator)
            if format is None:
                # legacy: list of (bitstring tensor, -1.0)
                from .. import quantum as qu

                bins = qu.sample_int2bin(idx, self._nqubits, self._d)
                if batch is None:
                    return bins[0], -1.0
                return [(bins[i], -1.0) for i in range(nbatch)]
            from .. import quantum as qu

            return qu.sample2all(
                idx, self._nqubits, format=format, jittable=jittable, d=self._d
            )
        # trajectory path
        if status is None:
            if random_generator is None:
                status = K.implicit_randu([nbatch, self._nqubits])
            else:
                status = K.stateful_randu(
                    random_generator, shape=[nbatch, self._nqubits]
                )

        def one_shot(st: Tensor) -> Tuple[Tensor, Tensor]:
            return self.measure_jit(
                *range(self._nqubits), with_prob=True, status=st
            )

        samples, probs = jax.vmap(one_shot)(status)
        if format is None:
            if batch is None:
                return samples[0], probs[0]
            return [(samples[i], probs[i]) for i in range(nbatch)]
        from .. import quantum as qu

        idx = qu.sample_bin2int(samples, self._nqubits, self._d)
        return qu.sample2all(
            idx, self._nqubits, format=format, jittable=jittable, d=self._d
        )

    def _sample_large_n(
        self,
        nbatch: int,
        batch: Optional[int],
        format: Optional[str],
        status: Optional[Tensor],
        jittable: bool,
        readout_error: Optional[Tensor] = None,
        random_generator: Optional[Any] = None,
    ) -> Any:
        """Autoregressive sampling without any 2^n object.

        Per qubit, P(q = v | measured prefix) comes from a planned
        (light-cone pruned) contraction of projector expectations on the
        einsum IR — the scalable role of the reference's tn-based
        ``perfect_sampling`` for wide shallow circuits.
        """
        import numpy as np

        from ..core import contractor as _ctr

        n = self._nqubits
        d = self._d
        if status is None:
            if random_generator is not None:
                status_np = np.asarray(
                    jax.device_get(K.stateful_randu(random_generator, shape=[nbatch, n]))
                )
            else:
                rng = np.random.default_rng()
                status_np = rng.uniform(size=(nbatch, n))
        else:
            status_np = np.asarray(jax.device_get(status)).reshape(nbatch, n)
        # One jitted program per prefix LENGTH (wires 0..q), with the
        # projector diagonals as TRACED real inputs: reused across shots and
        # outcomes (n programs total, not batch*n*d), and — critical on the
        # axon TPU — no complex value ever crosses the jit boundary and no
        # eager einsum chain runs on complex device arrays (CLAUDE.md
        # complex rule; gate tensors enter as numpy constants).
        joint_fns: Dict[int, Any] = {}

        def joint(outcomes_ints: List[int]) -> float:
            q = len(outcomes_ints) - 1
            if q not in joint_fns:

                def f(outcomes: Tensor, _q: int = q) -> Tensor:
                    diags = jax.nn.one_hot(outcomes, d, dtype=jnp.float32)
                    ops = [
                        (jnp.eye(d, dtype=jnp.complex64) * diags[i][None, :], [i])
                        for i in range(_q + 1)
                    ]
                    val = _ctr.contract_ir(self.expectation_before(*ops))
                    return jnp.real(jnp.reshape(val, ()))

                joint_fns[q] = jax.jit(f)
            v = joint_fns[q](jnp.asarray(outcomes_ints, dtype=jnp.int32))
            return max(float(v), 0.0)

        samples = np.zeros((nbatch, n), dtype=np.int32)
        for b in range(nbatch):
            prefix: List[int] = []
            p_prefix = 1.0
            for q in range(n):
                # draw from P(q = v | prefix) = P(prefix ∧ v) / P(prefix)
                r = status_np[b, q] * p_prefix
                acc = 0.0
                outcome = d - 1
                p_joint = None
                for v in range(d - 1):
                    pv = joint(prefix + [v])
                    if r < acc + pv:
                        outcome = v
                        p_joint = pv
                        break
                    acc += pv
                if p_joint is None:  # last outcome takes the remainder
                    p_joint = max(p_prefix - acc, 1e-30)
                samples[b, q] = outcome
                prefix = prefix + [outcome]
                p_prefix = max(p_joint, 1e-30)
        if readout_error is not None:
            if d != 2:
                raise NotImplementedError("readout_error needs qubits (d=2)")
            # stochastic per-bit confusion: readout_error[i] = [P(0|0), P(1|1)]
            err = np.asarray(jax.device_get(jnp.asarray(readout_error)), dtype=np.float64)
            # deterministic given the sampling status tensor (cross-process)
            import zlib

            rng_ro = np.random.default_rng(zlib.crc32(status_np.tobytes()))
            keep = np.where(samples == 0, err[None, :, 0], err[None, :, 1])
            flips = rng_ro.uniform(size=samples.shape) >= keep
            samples = np.where(flips, 1 - samples, samples).astype(np.int32)
        samples_j = jnp.asarray(samples)
        if format is None:
            if batch is None:
                return samples_j[0], -1.0
            return [(samples_j[i], -1.0) for i in range(nbatch)]
        from .. import quantum as qu

        idx = qu.sample_bin2int(samples_j, n, d)
        return qu.sample2all(idx, n, format=format, jittable=jittable, d=d)

    def readouterror_bs(
        self, readout_error: Optional[Sequence[Any]] = None, p: Optional[Tensor] = None
    ) -> Tensor:
        """Apply per-qubit readout confusion to probability vector ``p``.

        ``readout_error[i] = [P(0|0), P(1|1)]`` per the reference
        (``basecircuit.py:1656-1701``).
        """
        if readout_error is None:
            return p
        for i, err in enumerate(readout_error):
            p00 = err[0]
            p11 = err[1]
            m = jnp.asarray(
                [[p00, 1.0 - p11], [1.0 - p00, p11]], dtype=p.dtype
            )
            p = statevec.apply_unitary(p, m, [i], self._d)
        return p

    # ------------------------------------------------------------------
    # expectation
    # ------------------------------------------------------------------

    def expectation(
        self,
        *ops: Tuple[Any, Sequence[int]],
        reuse: bool = True,
        enable_lightcone: bool = False,
        noise_conf: Optional[Any] = None,
        nmc: int = 1000,
        status: Optional[Tensor] = None,
        **kws: Any,
    ) -> Tensor:
        """⟨psi| O_1 O_2 ... |psi⟩ with O_i = (operator, [wires]).

        Operators may be ``Gate`` instances or dense tensors.  Mirrors
        reference ``circuit.py:833-913``; light-cone simplification
        (``simplify.py:198-296``) is applied at the QIR level when
        ``enable_lightcone=True``.
        """
        if noise_conf is not None:
            from .. import noisemodel

            return noisemodel.expectation_noisfy(
                self, *ops, noise_conf=noise_conf, nmc=nmc, status=status, **kws
            )
        norm_ops = []
        for op in ops:
            if isinstance(op, tuple) and len(op) == 2:
                o, wires = op
            else:
                raise ValueError("each op must be (operator, [wires])")
            if isinstance(o, Gate):
                o = o.tensor
            if not hasattr(wires, "__len__"):
                wires = [wires]
            norm_ops.append((jnp.asarray(o), [int(w) % self._nqubits for w in wires]))
        if self._mesh_engine is not None:
            # multi-chip engine: ops applied shard-wise, one psum
            return self._mesh_engine.expectation(self.state(reuse=reuse), norm_ops)
        if self._nqubits > self._DENSE_MAX_QUBITS:
            # lazy einsum-IR path (wide shallow circuits): lightcone + planned
            # contraction, never materializing the dense state
            from ..core import contractor as _ctr
            from ..core import einsum_ir as _eir

            ir = _eir.expectation_ir(
                self._expanded_qir(), self._nqubits, norm_ops, d=self._d, lightcone=True
            )
            return _ctr.contract_ir(ir)
        from .. import config as _config

        if int(dict(_config.current().contractor_options or {}).get("debug_level", 0)) >= 2:
            self._maybe_print_cost_info()
            return jnp.zeros((), dtype=jnp.complex64)  # shape-only dry run
        if enable_lightcone:
            psi = self._lightcone_state([w for _, ws in norm_ops for w in ws])
            reuse = False
        else:
            psi = self.state(reuse=reuse)
        self._maybe_print_cost_info()
        phi = psi
        for o, wires in norm_ops:
            phi = statevec.apply_unitary(phi, o.astype(phi.dtype), wires, self._d)
        return jnp.vdot(psi, phi)

    def _maybe_print_cost_info(self) -> None:
        """Dense-engine analog of ``contraction_info=True`` (reference
        ``cons.py:1084-1120`` prints per contraction; here per circuit shape)."""
        from .. import config as _config
        from ..core import contractor as _ctr
        import math as _math

        meta = dict(_config.current().contractor_options or {})
        if not meta.get("contraction_info"):
            return
        key = ("dense", self._nqubits, self._d, len(self._qir))
        if key in _ctr._INFO_PRINTED:
            return
        _ctr._INFO_PRINTED.add(key)
        dim = self._d**self._nqubits
        flops = 0
        for item in self._qir:
            k = len(item.get("index", ())) or 1
            flops += 2 * dim * self._d**k
        print(
            "------ contraction cost summary ------\n"
            f"log10[FLOPs]: {_math.log10(max(flops, 1)):.3f}  "
            f"log2[SIZE]: {_math.log2(dim):.3f}  gates: {len(self._qir)}"
        )

    def _lightcone_qir(self, obs_wires: Sequence[int]) -> List[Dict[str, Any]]:
        """Drop gates outside the observable's causal cone.

        IR-pass replacement for reference ``simplify.py:198-296``.
        """
        cone = set(obs_wires)
        keep: List[Dict[str, Any]] = []
        for item in reversed(self._qir):
            if cone.intersection(item["index"]):
                keep.append(item)
                cone.update(item["index"])
        keep.reverse()
        return keep

    def _lightcone_state(self, obs_wires: Sequence[int]) -> Tensor:
        psi = self._initial_state()
        for item in self._lightcone_qir(obs_wires):
            psi = self._apply_item(psi, item)
        return psi

    def sample_expectation_ps(
        self,
        x: Optional[Sequence[int]] = None,
        y: Optional[Sequence[int]] = None,
        z: Optional[Sequence[int]] = None,
        shots: Optional[int] = None,
        random_generator: Optional[Any] = None,
        status: Optional[Tensor] = None,
        readout_error: Optional[Sequence[Any]] = None,
        noise_conf: Optional[Any] = None,
        nmc: int = 1000,
        statusc: Optional[Tensor] = None,
        **kws: Any,
    ) -> Tensor:
        """Shot-based Pauli-string expectation (reference ``:1514-1654``).

        Rotates measured qubits into the Z basis, samples (or uses the exact
        distribution when ``shots is None``), and averages parities.
        """
        if noise_conf is not None:
            from .. import noisemodel

            return noisemodel.sample_expectation_ps_noisfy(
                self,
                x=x,
                y=y,
                z=z,
                shots=shots,
                noise_conf=noise_conf,
                nmc=nmc,
                status=statusc,
                readout_error=readout_error,
                **kws,
            )
        c = self.copy()
        for q in x or ():
            c.h(q)  # type: ignore
        for q in y or ():
            c.sd(q)  # type: ignore
            c.h(q)  # type: ignore
        measure_wires = list(x or ()) + list(y or ()) + list(z or ())
        p = c.probability()
        p = p / jnp.sum(p)
        if readout_error is not None:
            p = c.readouterror_bs(readout_error, p)
        # parity of measured wires per basis state (flat sign-mask products)
        parity = jnp.ones_like(p)
        sign = jnp.asarray([1.0, -1.0] + [1.0] * (self._d - 2), dtype=p.dtype)
        for w in measure_wires:
            parity = statevec.apply_diagonal(parity, sign, [w], self._d)
        if shots is None:
            return jnp.sum(p * parity)
        idx = K.probability_sample(shots, p, status=status, g=random_generator)
        return jnp.mean(parity[idx])

    # ------------------------------------------------------------------
    # subsystem tools
    # ------------------------------------------------------------------

    def projected_subsystem(
        self, traceout: Tensor, left: Sequence[int]
    ) -> Tensor:
        """Reduced state on sites in ``left``; every other site is projected
        onto the per-site digit in ``traceout``.

        Reference semantics and signature (``basecircuit.py:1823``):
        ``traceout`` is a length-n digit tensor (entries at ``left``
        positions are ignored; may be jit-traced), ``left`` the static tuple
        of sites to keep.  Returns the normalized reduced state.
        """
        left = tuple(int(q) for q in left)
        tv = jnp.reshape(jnp.asarray(traceout), (-1,)).astype(jnp.int32)
        psi = self.state()
        n = self._nqubits
        d = self._d
        # slice out the projected slots, descending so positions stay valid
        for q in sorted((q for q in range(self._nqubits) if q not in left), reverse=True):
            a = d**q
            b = d ** (n - 1 - q)
            psi = jnp.reshape(psi, (a, d, b))[:, tv[q], :]
            psi = jnp.reshape(psi, (-1,))
            n -= 1
        nrm = jnp.linalg.norm(psi)
        return psi / nrm.astype(psi.dtype)

    def get_quvector(self) -> Any:
        """Return the output state as a :class:`~.quantum.QuVector`."""
        from .. import quantum as qu

        return qu.QuVector.from_tensor(self.state(form="tensor"))

    # ------------------------------------------------------------------
    # reference node-graph compatibility surface (basecircuit.py:104-181,
    # 1823).  The dense engine has no tn.Node graph; these provide the same
    # *services* over the QIR / dense state instead (documented deviation).
    # ------------------------------------------------------------------

    def outcome_probability(self, bitstring: Any) -> Tensor:
        """P(measuring ``bitstring``) on the current state (reference role)."""
        amp = self.amplitude(bitstring)
        return jnp.real(jnp.conj(amp) * amp)

    def all_zero_nodes(self) -> List[Any]:
        """|0...0⟩ input "nodes": the dense initial state (reference :52-66)."""
        return [self._initial_state()]

    def copy_nodes(self, conj: bool = False) -> List[Any]:
        """Copy of the circuit's tensors; conjugated for the bra half (ref :150)."""
        tensors = [jnp.asarray(item["gate"].tensor) for item in self._expanded_qir()]
        if conj:
            tensors = [jnp.conj(t) for t in tensors]
        return tensors

    def front_from_nodes(self, nodes: Any = None) -> List[int]:
        """Dangling-edge handles: qubit slots of the dense state (reference role)."""
        return list(range(self._nqubits))

    def coloring_nodes(self, *args: Any, **kws: Any) -> None:
        """Light-cone tagging is an IR pass here (see ``simplify.light_cone_qir``);
        kept as a no-op for reference-API compatibility (reference :104-148)."""

    def coloring_copied_nodes(self, *args: Any, **kws: Any) -> None:
        """See :meth:`coloring_nodes` (reference :128)."""

    def to_graphviz(self, graph: Any = None, include_all_names: bool = False) -> str:
        """DOT text of the circuit DAG (reference ``to_graphviz`` renders the
        tn graph; here nodes are gates, edges are qubit wires)."""
        lines = ["digraph circuit {", "  rankdir=LR;"]
        last = {q: f"q{q}_in" for q in range(self._nqubits)}
        for q in range(self._nqubits):
            lines.append(f'  q{q}_in [label="q{q}|0>", shape=plaintext];')
        for gi, item in enumerate(self._qir):
            name = item.get("name") or "?"
            node = f"g{gi}"
            lines.append(f'  {node} [label="{name}", shape=box];')
            for q in item["index"]:
                lines.append(f"  {last[int(q)]} -> {node};")
                last[int(q)] = node
        for q in range(self._nqubits):
            lines.append(f'  q{q}_out [label="q{q}", shape=plaintext];')
            lines.append(f"  {last[q]} -> q{q}_out;")
        lines.append("}")
        return "\n".join(lines)
