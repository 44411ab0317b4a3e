"""Composed compilation pipelines (reference ``compiler/composed_compiler.py:13-84``)."""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

__all__ = ["Compiler", "DefaultCompiler", "default_compile"]


class Compiler:
    """Chain of compile stages, each ``(circuit, info) -> (circuit, info)``."""

    def __init__(self, compile_funcs: Sequence[Callable[..., Any]], compiled_options: Optional[Sequence[Dict[str, Any]]] = None):
        self.compile_funcs = list(compile_funcs)
        self.compiled_options = list(compiled_options or [{}] * len(self.compile_funcs))

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
