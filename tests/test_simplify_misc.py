"""simplify passes, chems templates, QCIS translation tests."""

import numpy as np
import pytest
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu import simplify
from tensorcircuit_ng_tpu.templates import chems
from tensorcircuit_ng_tpu.cloud import tianyan


def test_split_two_qubit_gate_reconstruction():
    g = np.asarray(tc.gates.cnot().matrix())
    a, s, b = simplify.split_two_qubit_gate(jnp.asarray(g))
    rec = np.einsum("oik,k,kpj->opij", np.asarray(a), np.asarray(s), np.asarray(b))
    rec = rec.reshape(4, 4)  # (o1 o2) x (i1 i2)
    np.testing.assert_allclose(rec, g, atol=1e-6)
    assert simplify.gate_schmidt_rank(jnp.asarray(g)) == 2
    swap = np.asarray(tc.gates.swap().matrix())
    assert simplify.gate_schmidt_rank(jnp.asarray(swap)) == 4
    prod = np.kron(np.diag([1, 1j]), np.asarray(tc.gates.h().matrix()))
    assert simplify.gate_schmidt_rank(jnp.asarray(prod)) == 1


def test_light_cone_qir():
    c = tc.Circuit(4)
    c.h(0)
    c.h(3)
    c.cnot(0, 1)
    c.cnot(2, 3)
    kept = simplify.light_cone_qir(c.to_qir(), [0])
    names_idx = [(i["name"], i["index"]) for i in kept]
    assert ("cnot", (2, 3)) not in names_idx
    assert ("cnot", (0, 1)) in names_idx


def test_h2_hamiltonian_ground_energy():
    h = np.asarray(chems.h2_hamiltonian())
    e = np.linalg.eigvalsh(h)
    # H2/STO-3G ground state approx -1.85 Hartree (incl. identity offset here)
    assert e[0] < -1.8
    np.testing.assert_allclose(h, h.conj().T, atol=1e-8)


def test_jordan_wigner_two_body_matches_fgs():
    tc.set_dtype("complex128")
    try:
        L = 3
        hpq = np.array([[0.5, 0.7, 0.0], [0.7, -0.2, 0.3], [0.0, 0.3, 0.1]])
        ls, ws = chems.jordan_wigner_two_body(hpq)
        from tensorcircuit_ng_tpu import quantum as qu
        from tensorcircuit_ng_tpu.models.fgs import FGSTestSimulator

        hq = np.asarray(qu.PauliStringSum2Dense(ls, ws))
        sim = FGSTestSimulator(L, filled=[0])
        hd = sim.hamiltonian_dense(hpq.astype(complex))
        np.testing.assert_allclose(np.sort(np.linalg.eigvalsh(hq)),
                                   np.sort(np.linalg.eigvalsh(hd)), atol=1e-8)
    finally:
        tc.set_dtype("complex64")


def test_qcis_translation():
    c = tc.Circuit(2)
    c.h(0)
    c.cz(0, 1)
    c.rz(1, theta=0.5)
    c.cnot(0, 1)
    text = tianyan.qir2qcis(c.to_qir(), 2)
    assert "CZ Q0 Q1" in text
    assert "RZ Q1" in text
    assert text.count("M Q") == 2
    bad = tianyan.validate_topology(c.to_qir(), [(0, 1)])
    assert bad == []
    bad2 = tianyan.validate_topology(c.to_qir(), [(1, 2)])
    assert len(bad2) == 2


@pytest.mark.slow  # treesa covered by test_native_treesa in the fast gate
def test_treesa_contractor_config():
    from tensorcircuit_ng_tpu.core import native
    if not native.treesa_available():
        pytest.skip("no g++")
    from tensorcircuit_ng_tpu.core import contractor as ctr
    c = tc.Circuit(6)
    for i in range(6):
        c.h(i)
    for i in range(5):
        c.cnot(i, i + 1)
    with tc.runtime_contractor("treesa", n_iters=200):
        ir = c.amplitude_before("0" * 6)
        v1 = ctr.contract_ir(ir)
    v2 = complex(np.asarray(c.amplitude("0" * 6)))
    np.testing.assert_allclose(complex(np.asarray(v1)), v2, atol=1e-5)


@pytest.mark.slow  # 6 s: jax AOT cost analysis compile; niche utility surface
def test_cost_analysis_and_params_ckpt(tmp_path):
    from tensorcircuit_ng_tpu import utils, experimental
    import jax

    f = lambda x: jnp.sum(x @ x)
    ca = utils.cost_analysis(f, jnp.ones((64, 64)))
    assert isinstance(ca, dict)
    params = {"w": jnp.ones((3,)), "b": jnp.zeros((2, 2))}
    path = str(tmp_path / "ckpt")
    experimental.save_params(path, params)
    restored = experimental.load_params(path)
    np.testing.assert_allclose(np.asarray(restored["w"]), np.ones(3))


def test_utils_predicates_and_counts_reverse():
    from tensorcircuit_ng_tpu.utils import is_sequence, is_number, gpu_memory_share
    from tensorcircuit_ng_tpu.results.counts import reverse_count
    from tensorcircuit_ng_tpu import asciiart

    assert is_sequence([1]) and is_sequence((1,)) and not is_sequence("ab")
    assert is_number(1) and is_number(np.float32(2.0)) and not is_number([1])
    gpu_memory_share(True)
    assert reverse_count({"01": 10, "10": 20}) == {"10": 10, "01": 20}
    asciiart.set_ascii(conf={"greet": "hello"})
    assert asciiart.get_message("greet") == "hello"
    assert isinstance(str(asciiart.lucky(seed=1)), str)


def test_contraction_info_and_debug_level():
    import io, contextlib
    import tensorcircuit_ng_tpu as tc

    try:
        tc.set_contractor("auto", contraction_info=True)
        c = tc.Circuit(5)
        for i in range(5):
            c.h(i)
        for i in range(4):
            c.cnot(i, i + 1)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            c.expectation_ps(z=[2])
            c.expectation_ps(z=[2])  # second call: same shape, printed once
        out = buf.getvalue()
        assert out.count("contraction cost summary") == 1
        assert "log10[FLOPs]" in out and "log2[SIZE]" in out

        tc.set_contractor("auto", debug_level=2)
        v = c.expectation_ps(x=[0])  # dry run: no compute, zeros back
        assert complex(np.asarray(v)) == 0j
    finally:
        tc.set_contractor("auto")


@pytest.mark.slow  # the fuse pass output is validated by circuit equivalence tests in CI
def test_fuse_single_qubit_qir_pass():
    """IR lowering pass: 1q chains merge and absorb into entanglers
    (reference simplify.py:131-196 + cons.py:298-374 roles)."""
    import numpy as np
    import jax.numpy as jnp
    import tensorcircuit_ng_tpu as tc
    from tensorcircuit_ng_tpu.simplify import fuse_single_qubit_qir
    from tensorcircuit_ng_tpu.core import contractor as ctr

    rng = np.random.default_rng(1)
    n, depth = 6, 4
    c = tc.Circuit(n)
    for l in range(depth):
        for i in range(n):
            c.rx(i, theta=float(rng.normal() * 0.4))
            c.rz(i, theta=float(rng.normal() * 0.4))
        for i in range(l % 2, n - 1, 2):
            c.cnot(i, i + 1)
    qir = c._expanded_qir()
    fused = fuse_single_qubit_qir(qir)
    n_entanglers = sum(1 for it in qir if len(it["index"]) > 1)
    # every surviving item is (absorbed) entangler or a trailing merged1q
    assert len(fused) <= n_entanglers + n
    assert len(fused) < len(qir) / 2
    # gate-count reduction is visible in the planned network
    ir = c.expectation_before((tc.gates.z(), [2]))
    info = ctr.contraction_info(ir)
    assert len(ir.inputs) < len(qir)  # far fewer operands than raw gates
    # physics unchanged
    e_ir = complex(np.asarray(ctr.contract_ir(ir)))
    e_dense = complex(np.asarray(c.expectation_ps(z=[2])))
    np.testing.assert_allclose(e_ir, e_dense, atol=1e-5)
    # identity chains drop entirely when concrete
    c2 = tc.Circuit(2)
    c2.x(0)
    c2.x(0)
    c2.cnot(0, 1)
    f2 = fuse_single_qubit_qir(c2._expanded_qir())
    assert len(f2) == 1 and f2[0]["name"].startswith("cnot")
