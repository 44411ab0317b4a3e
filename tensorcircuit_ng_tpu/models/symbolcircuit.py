"""``SymbolCircuit``: sympy-parameterized circuits evaluated lazily.

Counterpart of reference ``symbolcircuit.py:48-652``: gate parameters may be
sympy symbols; ``wavefunction``/``amplitude``/``matrix`` return symbolic
expressions, and ``subs``/``to_circuit`` bind numeric values to produce an
ordinary jittable :class:`Circuit` (the reference's lambdify-to-jax workflow,
``examples/lambdify_jax_symbolcircuit.py``).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import numpy as np

from .. import config
from .abstractcircuit import AbstractCircuit

Tensor = Any

__all__ = ["SymbolCircuit"]


def _sym_gate_matrix(name: str, params: Dict[str, Any]) -> Any:
    import sympy as sp

    name = name.lower()
    if name in ("rx", "ry", "rz"):
        th = params.get("theta", 0)
        c = sp.cos(th / 2)
        s = sp.sin(th / 2)
        if name == "rx":
            return sp.Matrix([[c, -sp.I * s], [-sp.I * s, c]])
        if name == "ry":
            return sp.Matrix([[c, -s], [s, c]])
        return sp.Matrix([[c - sp.I * s, 0], [0, c + sp.I * s]])
    if name in ("rzz", "rxx", "ryy"):
        th = params.get("theta", 0)
        c = sp.cos(th / 2)
        s = sp.sin(th / 2)
        i4 = sp.eye(4)
        if name == "rzz":
            g = sp.diag(1, -1, -1, 1)
        elif name == "rxx":
            g = sp.Matrix([[0, 0, 0, 1], [0, 0, 1, 0], [0, 1, 0, 0], [1, 0, 0, 0]])
        else:
            g = sp.Matrix([[0, 0, 0, -1], [0, 0, 1, 0], [0, 1, 0, 0], [-1, 0, 0, 0]])
        return c * i4 - sp.I * s * g
    if name == "phase":
        th = params.get("theta", 0)
        return sp.Matrix([[1, 0], [0, sp.exp(sp.I * th)]])
    if name == "cphase":
        th = params.get("theta", 0)
        m = sp.eye(4)
        m[3, 3] = sp.exp(sp.I * th)
        return m
    if name == "crz":
        th = params.get("theta", 0)
        m = sp.eye(4)
        m[2, 2] = sp.cos(th / 2) - sp.I * sp.sin(th / 2)
        m[3, 3] = sp.cos(th / 2) + sp.I * sp.sin(th / 2)
        return m
    # fixed gates from the numeric registry
    from ..ops import gates as gates_mod

    g = gates_mod.get_gate(name)()
    m = np.asarray(g.matrix())
    return sp.Matrix(sp.nsimplify(sp.Matrix(m), rational=False))


def _need_binding(name: str) -> Any:
    """Method factory: delegate ``name`` to the numerically-bound Circuit."""

    def meth(self: "SymbolCircuit", *args: Any, bindings: Optional[Dict[Any, Any]] = None, **kws: Any) -> Any:
        if bindings is None and self.free_symbols():
            raise ValueError(
                f"SymbolCircuit.{name} requires numeric values: pass bindings={{symbol: value}}"
            )
        return getattr(self.to_circuit(bindings), name)(*args, **kws)

    meth.__name__ = name
    meth.__doc__ = f"Numeric ``{name}`` after binding symbols (reference parity)."
    return meth


class SymbolCircuit(AbstractCircuit):
    """Circuit whose parameters may be sympy expressions."""

    def __init__(self, nqubits: int, inputs: Optional[Any] = None, dim: int = 2) -> None:
        import sympy as sp

        super().__init__()
        self._nqubits = nqubits
        self._d = 2
        self._inputs = inputs
        if inputs is not None:
            self._psi0 = sp.Matrix(list(np.asarray(inputs).reshape(-1)))
        else:
            v = [0] * (2**nqubits)
            v[0] = 1
            self._psi0 = sp.Matrix(v)

    # intercept gate application: store symbolic matrix in QIR
    def _apply_gate_instance(self, gatef, *index, name, split=None, **params):
        if index and hasattr(index[0], "__iter__"):
            seqs = [list(i) for i in index]
            for pos in range(len(seqs[0])):
                self._apply_gate_instance(
                    gatef, *(s[pos] for s in seqs), name=name, split=split, **params
                )
            return
        m = _sym_gate_matrix(name, params)
        self._qir.append(
            {
                "gatef": gatef,
                "gate": None,
                "sym_matrix": m,
                "index": tuple(int(i) for i in index),
                "name": name,
                "parameters": dict(params),
                "split": None,
                "mpo": False,
            }
        )

    def any(self, *index: int, unitary: Any, name: str = "any", **kws: Any) -> None:
        import sympy as sp

        m = unitary if hasattr(unitary, "is_Matrix") and unitary.is_Matrix else sp.Matrix(
            np.asarray(unitary).reshape(2 ** len(index), 2 ** len(index))
        )
        self._qir.append(
            {
                "gatef": None,
                "gate": None,
                "sym_matrix": m,
                "index": tuple(int(i) for i in index),
                "name": name,
                "parameters": {},
                "split": None,
                "mpo": False,
            }
        )

    unitary = any

    # ------------------------------------------------------------------
    # symbolic evaluation
    # ------------------------------------------------------------------

    def _embed(self, m: Any, index: Tuple[int, ...]) -> Any:
        """Embed a gate matrix into the full 2^n space symbolically."""
        import sympy as sp

        n = self._nqubits
        k = len(index)
        full = None
        # build via tensor contraction on a permutation basis: use kron with
        # explicit qubit reordering
        order = list(index) + [q for q in range(n) if q not in set(index)]
        big = sp.Matrix(sp.kronecker_product(m, sp.eye(2 ** (n - k))))
        perm = _qubit_permutation_matrix(order, n)
        return perm.T * big * perm

    def matrix(self) -> Any:
        import sympy as sp

        u = sp.eye(2**self._nqubits)
        for item in self._qir:
            u = self._embed(item["sym_matrix"], item["index"]) * u
        return u

    def wavefunction(self) -> Any:
        psi = self._psi0
        for item in self._qir:
            psi = self._embed(item["sym_matrix"], item["index"]) * psi
        return psi

    state = wavefunction

    def amplitude(self, l: Union[str, Sequence[int]]) -> Any:
        if isinstance(l, str):
            l = [int(ch, 36) for ch in l]
        idx = 0
        for v in l:
            idx = idx * 2 + int(v)
        return self.wavefunction()[idx]

    def expectation_ps(
        self,
        x: Optional[Sequence[int]] = None,
        y: Optional[Sequence[int]] = None,
        z: Optional[Sequence[int]] = None,
        **kws: Any,
    ) -> Any:
        import sympy as sp

        psi = self.wavefunction()
        op = sp.eye(2**self._nqubits)
        mats = {
            "x": sp.Matrix([[0, 1], [1, 0]]),
            "y": sp.Matrix([[0, -sp.I], [sp.I, 0]]),
            "z": sp.Matrix([[1, 0], [0, -1]]),
        }
        for key, qubits in (("x", x), ("y", y), ("z", z)):
            for q in qubits or ():
                op = self._embed(mats[key], (int(q),)) * op
        return sp.simplify((psi.H * op * psi)[0, 0])

    # ------------------------------------------------------------------
    # binding
    # ------------------------------------------------------------------

    def free_symbols(self) -> set:
        syms = set()
        for item in self._qir:
            for v in item.get("parameters", {}).values():
                if hasattr(v, "free_symbols"):
                    syms |= v.free_symbols
        return syms

    def subs(self, bindings: Dict[Any, Any]) -> "SymbolCircuit":
        """Substitute symbols, returning a new SymbolCircuit.

        Construction state (inputs) is propagated — the reference bind
        explicitly does this so binding does not silently reset to |0>.
        """
        c = SymbolCircuit(self._nqubits, inputs=getattr(self, "_inputs", None))
        for item in self._qir:
            new_item = dict(item)
            new_item["sym_matrix"] = item["sym_matrix"].subs(bindings)
            new_item["parameters"] = {
                k: (v.subs(bindings) if hasattr(v, "subs") else v)
                for k, v in item.get("parameters", {}).items()
            }
            c._qir.append(new_item)
        return c

    def to_circuit(self, bindings: Optional[Dict[Any, Any]] = None) -> Any:
        """Bind all symbols numerically and return a jittable ``Circuit``."""
        from .circuit import Circuit

        c = Circuit(self._nqubits)
        for item in self._qir:
            params = {}
            ok = True
            for k1, v in item.get("parameters", {}).items():
                if hasattr(v, "subs"):
                    v = v.subs(bindings or {})
                    v = complex(v) if v.is_number else None
                    if v is None:
                        ok = False
                        break
                    v = v.real if abs(v.imag) < 1e-12 else v
                params[k1] = v
            if not ok:
                raise ValueError("unbound symbols remain; provide bindings")
            if item["gatef"] is not None:
                c._apply_gate_instance(
                    item["gatef"], *item["index"], name=item["name"], **params
                )
            else:
                m = item["sym_matrix"]
                if bindings:
                    m = m.subs(bindings)
                c.any(*item["index"], unitary=np.asarray(m, dtype=complex), name=item["name"])
        return c

    # ---- reference-parity surface (symbolcircuit.py:48-652) ----

    def bind(self, bindings: Dict[Any, Any]) -> "SymbolCircuit":
        """Partial or full symbol substitution -> new SymbolCircuit.

        Reference ``symbolcircuit.py:716``: bind returns a SymbolCircuit
        (use :meth:`to_circuit` for the numeric jittable Circuit).
        """
        return self.subs(bindings)

    def probability(self) -> Any:
        """Symbolic probability vector |ψ_s|² (reference parity)."""
        import sympy as sp

        psi = self.wavefunction()
        return sp.Matrix([sp.Abs(x) ** 2 for x in psi])

    def expectation_before(self, *ops: Any, **kws: Any) -> Any:
        """Symbolic ⟨ψ|O|ψ⟩ builder (un-evaluated sympy matrix product)."""
        import sympy as sp

        psi = self.wavefunction()
        acc = None
        for op, wires in ops:
            m = sp.Matrix(np.asarray(op.matrix() if hasattr(op, "matrix") else op))
            full = self._embed(m, tuple(wires))
            term = (psi.conjugate().T * full * psi)[0]
            acc = term if acc is None else acc * term
        return acc

    def get_quoperator(self) -> Any:
        """Symbolic circuit matrix (QuOperator stand-in; reference name)."""
        return self.matrix()

    measure = _need_binding("measure")
    measure_reference = _need_binding("measure_reference")
    sample = _need_binding("sample")
    sample_expectation_ps = _need_binding("sample_expectation_ps")
    cond_measurement = _need_binding("cond_measurement")
    projected_subsystem = _need_binding("projected_subsystem")


def _qubit_permutation_matrix(order: Sequence[int], n: int) -> Any:
    """Permutation matrix P with (P psi)[new basis] ordering qubits by ``order``.

    P maps the natural-ordered state into the order where ``order[0]`` is the
    most significant qubit.
    """
    import sympy as sp

    dim = 2**n
    p = sp.zeros(dim, dim)
    for src in range(dim):
        bits = [(src >> (n - 1 - q)) & 1 for q in range(n)]
        dst = 0
        for q in order:
            dst = dst * 2 + bits[q]
        p[dst, src] = 1
    return p


