"""``AnalogCircuit``: hybrid digital-analog circuits.

Counterpart of reference ``analogcircuit.py:35-496``: digital gate segments
(ordinary ``Circuit``s) interleave with ``add_analog_block`` time-dependent
Hamiltonian evolutions solved by ODE through
:mod:`tensorcircuit_ng_tpu.timeevol`; ``state()`` folds segment → evolve →
segment; unknown attributes delegate to the current digital segment
(reference ``:249``).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple, Union

import numpy as np
import jax.numpy as jnp

from .. import config
from .circuit import Circuit

Tensor = Any

__all__ = ["AnalogCircuit", "AnalogBlock"]


class AnalogBlock:
    def __init__(
        self,
        hamiltonian_func: Callable[..., Any],
        time: Union[float, Sequence[float]],
        index: Optional[Sequence[int]] = None,
        solver_options: Optional[Dict[str, Any]] = None,
    ):
        self.hamiltonian_func = hamiltonian_func
        if np.ndim(time) == 0:
            self.t0, self.t1 = 0.0, float(np.asarray(time))
        else:
            t = np.asarray(time).reshape(-1)
            self.t0, self.t1 = float(t[0]), float(t[1])
        self.index = list(index) if index is not None else None
        self.solver_options = solver_options or {}


class AnalogCircuit:
    """Alternating digital circuits and analog evolution blocks."""

    def __init__(self, nqubits: int, inputs: Optional[Tensor] = None) -> None:
        self._nqubits = nqubits
        self._inputs = inputs
        self.digital_circuits: List[Circuit] = [Circuit(nqubits, inputs=inputs)]
        self.analog_blocks: List[AnalogBlock] = []
        self._state_cache: Optional[Tensor] = None

    @property
    def nqubits(self) -> int:
        return self._nqubits

    def add_analog_block(
        self,
        hamiltonian_func: Callable[..., Any],
        time: Union[float, Sequence[float]],
        index: Optional[Sequence[int]] = None,
        **solver_options: Any,
    ) -> None:
        """Append a time-dependent Hamiltonian evolution segment.

        ``hamiltonian_func(t)`` returns the (local or global) Hamiltonian
        matrix / MVP; ``time`` is a duration T or a [t0, t1] pair.
        """
        self.analog_blocks.append(
            AnalogBlock(hamiltonian_func, time, index, solver_options)
        )
        self.digital_circuits.append(Circuit(self._nqubits))
        self._state_cache = None

    def state(self, form: str = "default") -> Tensor:
        """Fold digital → analog → digital ... into the output state."""
        from .. import timeevol

        import jax.core as _core

        token = _core.get_opaque_trace_state()
        if self._state_cache is not None and self._state_cache[0] == token:
            return self._state_cache[1]
        psi = None
        for seg, c in enumerate(self.digital_circuits):
            if psi is not None:
                c = Circuit(self._nqubits, inputs=psi)
                c.append_from_qir(self.digital_circuits[seg].to_qir())
            psi = c.state()
            if seg < len(self.analog_blocks):
                blk = self.analog_blocks[seg]
                hf = blk.hamiltonian_func

                def shifted(t, _blk=blk, _hf=hf):
                    return _hf(t + _blk.t0)

                duration = blk.t1 - blk.t0
                if blk.index is None:
                    psi = timeevol.ode_evol_global(
                        shifted, psi, jnp.asarray([duration]), **blk.solver_options
                    )[0]
                else:
                    psi = timeevol.ode_evol_local(
                        shifted,
                        psi,
                        jnp.asarray([duration]),
                        blk.index,
                        **blk.solver_options,
                    )[0]
        self._state_cache = (token, psi)
        return psi

    wavefunction = state

    def expectation_ps(self, **kws: Any) -> Tensor:
        c = Circuit(self._nqubits, inputs=self.state())
        return c.expectation_ps(**kws)

    def expectation(self, *ops: Any, **kws: Any) -> Tensor:
        c = Circuit(self._nqubits, inputs=self.state())
        return c.expectation(*ops, **kws)

    def sample(self, *args: Any, **kws: Any) -> Any:
        c = Circuit(self._nqubits, inputs=self.state())
        return c.sample(*args, **kws)

    def amplitude(self, l: Any) -> Tensor:
        c = Circuit(self._nqubits, inputs=self.state())
        return c.amplitude(l)

    # ------------------------------------------------------------------
    # reference-parity methods (analogcircuit.py:40-496)
    # ------------------------------------------------------------------

    def current_digital_circuit(self) -> Circuit:
        """The digital segment gates are currently appended to."""
        return self.digital_circuits[-1]

    def set_solver_options(self, **solver_options: Any) -> None:
        """Default ODE solver options applied to subsequent analog blocks."""
        self._solver_defaults = dict(solver_options)
        for blk in self.analog_blocks:
            merged = dict(solver_options)
            merged.update(blk.solver_options)
            blk.solver_options = merged
        self._state_cache = None

    def append(self, other: Any) -> "AnalogCircuit":
        """Append another circuit's gates to the current digital segment."""
        self.digital_circuits[-1].append_from_qir(other.to_qir())
        self._state_cache = None
        return self

    def effective_circuit(self) -> Circuit:
        """A plain dense ``Circuit`` preparing the same output state.

        Analog blocks are folded into the input state (reference ``:249``
        region exposes the merged view for inspection/export).
        """
        return Circuit(self._nqubits, inputs=self.state())

    def inverse(self) -> "AnalogCircuit":
        """Inverse hybrid circuit: reversed segments, negated-time blocks."""
        inv = AnalogCircuit(self._nqubits)
        segs = [c.inverse() for c in self.digital_circuits[::-1]]
        blocks = self.analog_blocks[::-1]
        inv.digital_circuits = [segs[0]]
        for blk, seg in zip(blocks, segs[1:]):
            def neg_h(t, _hf=blk.hamiltonian_func, _t0=blk.t0, _t1=blk.t1):
                # reverse-time evolution of H(t): evolve under -H(t1 - t)
                return -_hf(_t1 - t + _t0 - _t0)

            inv.analog_blocks.append(
                AnalogBlock(neg_h, blk.t1 - blk.t0, blk.index, blk.solver_options)
            )
            inv.digital_circuits.append(seg)
        return inv

    def probability(self) -> Tensor:
        c = Circuit(self._nqubits, inputs=self.state())
        return c.probability()

    def measure_jit(self, *index: int, **kws: Any) -> Any:
        c = Circuit(self._nqubits, inputs=self.state())
        return c.measure_jit(*index, **kws)

    measure = measure_jit

    def __getattr__(self, name: str) -> Any:
        """Delegate gate calls to the current digital segment (reference ``:249``)."""
        if name.startswith("_"):
            raise AttributeError(name)
        target = self.digital_circuits[-1]
        attr = getattr(target, name)
        if callable(attr):

            def wrapper(*args: Any, **kws: Any) -> Any:
                self._state_cache = None
                return attr(*args, **kws)

            return wrapper
        return attr
