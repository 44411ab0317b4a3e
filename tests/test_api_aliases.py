"""Assignment-bound public API symbols (VERDICT r4 missing #1).

Each name here exists in the reference as a module-level assignment
(alias/partial/constant) that an AST def/class sweep misses; tools/apidiff.py
now walks ast.Assign and this test pins the runtime surface.
"""

import numpy as np
import pytest


def test_gates_state_constants():
    from tensorcircuit_ng_tpu.ops import gates

    np.testing.assert_allclose(gates.zero_state, [1, 0])
    np.testing.assert_allclose(gates.one_state, [0, 1])
    np.testing.assert_allclose(gates.plus_state, np.array([1, 1]) / np.sqrt(2))
    np.testing.assert_allclose(gates.minus_state, np.array([1, -1]) / np.sqrt(2))
    assert gates.PAULI_CHAR_TO_INDEX == {"I": 0, "X": 1, "Y": 2, "Z": 3}
    # *_gate aliases
    assert gates.rxx_gate is not None and gates.ryy_gate is not None
    assert gates.rzz_gate is not None and gates.exp_gate is not None


def test_channels_single_qubit_alias():
    from tensorcircuit_ng_tpu.ops import channels

    ks = channels.depolarizingchannel(0.01, 0.01, 0.01)
    channels.single_qubit_kraus_identity_check(ks)  # same callable as kraus_identity_check
    assert channels.single_qubit_kraus_identity_check is channels.kraus_identity_check


def test_experimental_func_save_load_aliases():
    from tensorcircuit_ng_tpu import experimental

    assert experimental.jax_func_save is experimental.jax_jitted_function_save
    assert experimental.jax_func_load is experimental.jax_jitted_function_load
    assert experimental.PADDING_VALUE == -1


def test_np_interface_alias():
    from tensorcircuit_ng_tpu import interfaces
    import jax.numpy as jnp

    assert interfaces.np_interface is interfaces.numpy_interface

    f = interfaces.np_interface(lambda x: jnp.sum(x**2), jit=False)
    out = f(np.array([1.0, 2.0]))
    assert isinstance(out, np.ndarray) or np.isscalar(out) or hasattr(out, "item")
    np.testing.assert_allclose(np.asarray(out), 5.0)


def test_quantum_count_conversions_reference_semantics():
    import tensorcircuit_ng_tpu.quantum as qu

    dense = qu.count_s2d((np.array([0, 3]), np.array([5.0, 2.0])), n=2)
    np.testing.assert_allclose(np.asarray(dense), [5.0, 0.0, 0.0, 2.0])
    idx, vals = qu.count_d2s(np.array([0.1, 0.0, -0.3, 0.2]))
    np.testing.assert_allclose(np.asarray(idx), [0, 2, 3])
    np.testing.assert_allclose(np.asarray(vals), [0.1, -0.3, 0.2])
    assert qu.counts_v2t is qu.count_s2d
    assert qu.count_t2v is qu.count_d2s


def test_quantum_paulistring_numpy_bindings():
    import tensorcircuit_ng_tpu.quantum as qu

    m = qu.PauliStringSum2COO_numpy([[1, 0], [3, 3]], [0.5, 0.5])
    dense = np.asarray(m.todense() if hasattr(m, "todense") else m)
    # 0.5*(X0 + Z0 Z1) on 2 qubits
    assert dense.shape == (4, 4)
    assert "numpy" in qu.PauliString2COO_jit


def test_get_tn_info_exports_topology():
    import tensorcircuit_ng_tpu as tc

    c = tc.Circuit(3)
    c.h(0)
    c.cx(0, 1)
    c.rzz(1, 2, theta=0.3)
    inputs, output, size_dict = tc.get_tn_info(c)
    assert len(output) == 3
    assert all(size_dict[i] == 2 for i in output)
    # one tensor per initial-state leg + per gate
    assert len(inputs) >= 5
    # EinsumIR passthrough
    from tensorcircuit_ng_tpu.core.einsum_ir import circuit_state_ir

    ir = circuit_state_ir(c._expanded_qir(), 3)
    i2, o2, s2 = tc.get_tn_info(ir)
    assert o2 == tuple(output)


def test_abstractcircuit_module_registries():
    from tensorcircuit_ng_tpu.models import abstractcircuit as ac

    assert "h" in ac.sgates and "cnot" in ac.sgates
    assert "rx" in ac.vgates and "rzz" in ac.vgates
    assert ac.mpogates == ["multicontrol", "mpo"]
    assert "rzm" in ac.diaggates
    assert "cx" in ac.gate_aliases
    assert "h" in ac.defined_gates and "multicontrol" in ac.defined_gates


def test_cloud_rget_rpost_and_defaults():
    from tensorcircuit_ng_tpu.cloud import utils as cu
    from tensorcircuit_ng_tpu.cloud import apis

    calls = []

    def transport(method, url, body, headers):
        calls.append((method, url, body))
        return {"ok": True}

    cu.set_transport(transport)
    try:
        assert cu.rget("http://x/y") == {"ok": True}
        assert cu.rpost("http://x/y", {"a": 1}) == {"ok": True}
        assert calls == [("GET", "http://x/y", None), ("POST", "http://x/y", {"a": 1})]
    finally:
        cu.set_transport(None)

    p0 = apis.get_provider()
    try:
        apis.set_provider("local")
        assert apis.default_provider.name == "local"
        assert apis.avail_providers == ["tencent", "local", "quafu", "tianyan"]
        assert apis.saved_token is apis._tokens
    finally:
        apis.set_provider(p0)


def test_compiler_default_merge_rules():
    import tensorcircuit_ng_tpu as tc
    from tensorcircuit_ng_tpu.compiler.simple_compiler import default_merge_rules, merge_pass

    assert default_merge_rules[("s", "s")] == "z"
    assert default_merge_rules[("t", "t")] == "s"

    c = tc.Circuit(1)
    c.s(0)
    c.s(0)
    qir = merge_pass(list(c.to_qir()))
    assert len(qir) == 1 and qir[0]["name"] == "z"

    # exactness: merged circuit state == unmerged
    c2 = tc.Circuit(1)
    c2.h(0)
    c2.t(0)
    c2.t(0)
    cc, _ = tc.compiler.simple_compile(c2)
    np.testing.assert_allclose(np.asarray(cc.state()), np.asarray(c2.state()), atol=1e-6)

    # h,h cancels
    c3 = tc.Circuit(1)
    c3.h(0)
    c3.h(0)
    qir3 = merge_pass(list(c3.to_qir()))
    assert len(qir3) == 0


def test_misc_module_constants():
    from tensorcircuit_ng_tpu import config, asciiart
    from tensorcircuit_ng_tpu.templates import lattice
    from tensorcircuit_ng_tpu.ops.quditgates import SINGLE_BUILDERS, TWO_BUILDERS

    assert config.package_name == "tensorcircuit_ng_tpu"
    assert config.idtypestr == "int32"
    assert asciiart.visible is False and "tpu_art" in asciiart.gallery
    assert lattice.SiteIndex is int
    m = SINGLE_BUILDERS["RX"][1](3, theta=0.5)
    assert np.asarray(m).shape == (3, 3)
    m2 = TWO_BUILDERS["SWAP"][1](2)
    np.testing.assert_allclose(np.asarray(m2), np.array([[1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0], [0, 0, 0, 1]]))


def test_qudit_builders_reference_omega_convention():
    """Review fix: reference builders are ``lambda d, omega, **kw``
    (reference quditgates.py:23-58) — omega must be accepted positionally
    and actually honored by the omega-aware gates; CSUM takes cv."""
    from tensorcircuit_ng_tpu.ops.quditgates import SINGLE_BUILDERS, TWO_BUILDERS

    w = np.exp(2j * np.pi * 2 / 3)  # alternative primitive cube root
    z = np.asarray(SINGLE_BUILDERS["Z"][1](3, w))
    assert abs(z[1, 1] - w) < 1e-6
    z_def = np.asarray(SINGLE_BUILDERS["Z"][1](3))
    assert abs(z_def[1, 1] - np.exp(2j * np.pi / 3)) < 1e-6
    h = np.asarray(SINGLE_BUILDERS["H"][1](3, w))
    assert abs(h[1, 1] - w / np.sqrt(3)) < 1e-6
    m = np.asarray(TWO_BUILDERS["CSUM"][1](3, None, cv=1))
    assert m[1 * 3 + 1, 1 * 3 + 0] == 1.0 and m[0, 0] == 1.0
    cp = np.asarray(TWO_BUILDERS["CPHASE"][1](3, w))
    assert abs(cp[1 * 3 + 1, 1 * 3 + 1] - w) < 1e-6
