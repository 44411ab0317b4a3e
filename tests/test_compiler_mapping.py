"""qiskit_compile mapping bookkeeping, offline (VERDICT r4 #7).

A mock transpiler stands in for qiskit.transpile; the positional-logical /
logical-physical round-trip rules are the reference's
(``compiler/qiskit_compiler.py:180-200``) and run with no qiskit installed.
"""

import numpy as np
import pytest

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu.compiler.composed_compiler import (
    compose_mapping_info,
    qiskit_compile,
)


def test_compose_mapping_identity_start():
    out = compose_mapping_info(None, {0: 2, 1: 0, 2: 1})
    assert out["logical_physical_mapping"] == {0: 2, 1: 0, 2: 1}
    assert out["positional_logical_mapping"] == {0: 0, 1: 1, 2: 2}


def test_compose_mapping_two_stage_composition():
    # stage 1 maps logical->physical {0:1, 1:0}; stage 2 permutes {0:2,1:0,2:1}
    info1 = compose_mapping_info(None, {0: 1, 1: 0, 2: 2})
    info2 = compose_mapping_info(info1, {0: 2, 1: 0, 2: 1})
    # logical 0 -> phys 1 (stage1) -> phys 0 (stage2)
    assert info2["logical_physical_mapping"] == {0: 0, 1: 2, 2: 1}
    # positional mapping passes through
    assert info2["positional_logical_mapping"] == info1["positional_logical_mapping"]


def test_compose_mapping_positional_passthrough():
    info = {"positional_logical_mapping": {0: 3, 1: 1}, "logical_physical_mapping": {3: 0, 1: 1}}
    out = compose_mapping_info(info, {0: 1, 1: 0})
    assert out["positional_logical_mapping"] == {0: 3, 1: 1}
    assert out["logical_physical_mapping"] == {3: 1, 1: 0}


class _MockLayout:
    def __init__(self, perm):
        self._perm = perm

    def final_index_layout(self):
        return self._perm


class _MockCompiled:
    """Minimal stand-in for a transpiled qiskit circuit."""

    def __init__(self, src, perm):
        self.num_qubits = len(perm)
        self.layout = _MockLayout(perm)
        self._src = src


def test_qiskit_compile_with_mock_transpiler():
    c = tc.Circuit(3)
    c.h(0)
    c.cx(0, 1)
    c.rz(2, theta=0.3)

    seen = {}

    def mock_transpile(qc, **opts):
        seen["opts"] = opts
        return _MockCompiled(qc, [2, 0, 1])

    compiled, info = qiskit_compile(
        c, output="qiskit", compiled_options={"optimization_level": 1},
        _transpile_fn=mock_transpile,
    )
    assert seen["opts"] == {"optimization_level": 1}
    assert info["logical_physical_mapping"] == {0: 2, 1: 0, 2: 1}
    assert info["positional_logical_mapping"] == {0: 0, 1: 1, 2: 2}

    # second stage composes through the first stage's info
    compiled2, info2 = qiskit_compile(
        compiled, info=info, output="qiskit",
        _transpile_fn=lambda qc, **kw: _MockCompiled(qc, [1, 2, 0]),
    )
    assert info2["logical_physical_mapping"] == {0: 0, 1: 1, 2: 2}


def test_qiskit_compile_layoutless_fallback():
    c = tc.Circuit(2)
    c.h(0)

    class _Bare:
        num_qubits = 2

    _, info = qiskit_compile(c, output="qiskit", _transpile_fn=lambda qc, **kw: _Bare())
    assert info["logical_physical_mapping"] == {0: 0, 1: 1}


def test_qiskit_compile_derives_positional_from_measures():
    """Review fix: positional_logical_mapping must come from the
    PRE-transpile circuit's measure order (reference
    qiskit_compiler.py:72-80), not default to identity."""
    c = tc.Circuit(3)
    c.h(0)
    c.cnot(0, 1)
    c.measure_instruction(2)
    c.measure_instruction(0)
    _, info = qiskit_compile(c, output="qiskit", _transpile_fn=lambda qc, **kw: qc)
    assert info["positional_logical_mapping"] == {0: 2, 1: 0}
    # no measures recorded -> identity convention
    c2 = tc.Circuit(2)
    c2.h(0)
    _, info2 = qiskit_compile(c2, output="qiskit", _transpile_fn=lambda qc, **kw: qc)
    assert info2["positional_logical_mapping"] == {0: 0, 1: 1}
