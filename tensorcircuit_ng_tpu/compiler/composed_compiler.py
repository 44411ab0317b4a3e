"""Composed compilation pipelines (reference ``compiler/composed_compiler.py:13-84``)."""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

__all__ = ["Compiler", "DefaultCompiler", "default_compile"]


class Compiler:
    """Chain of compile stages, each ``(circuit, info) -> (circuit, info)``."""

    def __init__(self, compile_funcs: Sequence[Callable[..., Any]], compiled_options: Optional[Sequence[Dict[str, Any]]] = None):
        self.compile_funcs = list(compile_funcs)
        self.compiled_options = list(compiled_options or [{}] * len(self.compile_funcs))

    def add_options(self, compiled_options: Optional[Any] = None) -> None:
        """Reset per-stage options (reference ``composed_compiler.py:25``)."""
        if compiled_options is None:
            self.compiled_options = [{} for _ in self.compile_funcs]
        elif isinstance(compiled_options, dict):
            self.compiled_options = [dict(compiled_options) for _ in self.compile_funcs]
        else:
            assert len(compiled_options) == len(self.compile_funcs), (
                "`compiled_options` must have the same list length as `compile_funcs`"
            )
            self.compiled_options = [dict(c or {}) for c in compiled_options]

    def __call__(self, circuit: Any, info: Optional[Dict[str, Any]] = None) -> Tuple[Any, Dict[str, Any]]:
        info = dict(info or {})
        for f, opts in zip(self.compile_funcs, self.compiled_options):
            result = f(circuit, info, **opts) if opts else f(circuit, info)
            if isinstance(result, tuple):
                circuit, info = result
            else:
                circuit = result
        # default identity mapping info for downstream wrappers
        info.setdefault(
            "logical_physical_mapping", {i: i for i in range(circuit.nqubits)}
        )
        info.setdefault(
            "positional_logical_mapping", {i: i for i in range(circuit.nqubits)}
        )
        return circuit, info


class DefaultCompiler(Compiler):
    """simple_compile pipeline; qiskit transpilation slots in when available."""

    def __init__(self, qiskit_compiled_options: Optional[Dict[str, Any]] = None):
        from .simple_compiler import simple_compile

        funcs: List[Callable[..., Any]] = [simple_compile]
        try:  # optional qiskit transpile stage
            import qiskit  # type: ignore # noqa

            funcs.append(_qiskit_stage(qiskit_compiled_options or {}))
        except ImportError:
            pass
        super().__init__(funcs)


def _qiskit_stage(options: Dict[str, Any]) -> Any:
    def stage(circuit: Any, info: Dict[str, Any]) -> Tuple[Any, Dict[str, Any]]:
        from qiskit import transpile  # type: ignore

        from ..translation import qir2qiskit, qiskit2tc

        qc = qir2qiskit(circuit.to_qir(), circuit.nqubits)
        tqc = transpile(qc, **options)
        return qiskit2tc(tqc, type(circuit)), info

    return stage


def default_compile(
    circuit: Any,
    info: Optional[Dict[str, Any]] = None,
    compiled_options: Optional[Dict[str, Any]] = None,
) -> Tuple[Any, Dict[str, Any]]:
    """One-call compile entry (reference ``default_compile``)."""
    return DefaultCompiler(compiled_options)(circuit, info)


def qiskit_compile(
    circuit: Any,
    info: Optional[Dict[str, Any]] = None,
    output: str = "tc",
    compiled_options: Optional[Dict[str, Any]] = None,
) -> Any:
    """qiskit.transpile-backed compilation (reference ``qiskit_compiler.py:124``).

    Requires qiskit; tracks the positional-logical mapping through transpile.
    """
    from qiskit.compiler import transpile  # type: ignore

    from ..translation import get_qiskit_qasm

    if hasattr(circuit, "to_qiskit"):
        qc = circuit.to_qiskit()
    else:
        qc = circuit
    options = compiled_options or {"optimization_level": 2}
    compiled = transpile(qc, **options)
    info = dict(info or {})
    try:
        layout = compiled.layout.final_index_layout()
        info["logical_physical_mapping"] = {i: p for i, p in enumerate(layout)}
    except Exception:
        pass
    if output == "qiskit":
        return compiled, info
    if output == "qasm":
        return get_qiskit_qasm(compiled), info
    from ..models.circuit import Circuit

    return Circuit.from_openqasm(get_qiskit_qasm(compiled)), info


