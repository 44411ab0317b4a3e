"""Periphery tests: translation, compiler, results, cloud, vis, layers, symbolic."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu import translation, utils
from tensorcircuit_ng_tpu.compiler import simple_compile, default_compile
from tensorcircuit_ng_tpu.results import counts as counts_mod
from tensorcircuit_ng_tpu.results.readout_mitigation import ReadoutMit


def sample_circuit():
    c = tc.Circuit(3)
    c.h(0)
    c.rx(1, theta=0.5)
    c.cnot(0, 1)
    c.rzz(1, 2, theta=0.3)
    c.u(2, theta=0.2, phi=0.1, lbd=0.4)
    return c


@pytest.mark.slow  # QIR<->JSON covered by the jsonio example + CI tier
def test_json_roundtrip():
    c = sample_circuit()
    s = translation.circuit_to_json(c)
    c2 = translation.circuit_from_json(s)
    np.testing.assert_allclose(np.asarray(c2.state()), np.asarray(c.state()), atol=1e-5)


def test_qasm_roundtrip():
    c = sample_circuit()
    qasm = translation.circuit_to_qasm(c)
    assert "OPENQASM 2.0" in qasm
    c2 = translation.qasm2tc(qasm)
    np.testing.assert_allclose(
        np.abs(np.vdot(np.asarray(c2.state()), np.asarray(c.state()))), 1.0, atol=1e-5
    )


def test_qasm_parse_expressions():
    qasm = """OPENQASM 2.0;
include "qelib1.inc";
qreg q[2];
h q[0];
rz(pi/2) q[1];
cx q[0],q[1];
"""
    c = translation.qasm2tc(qasm)
    assert c.nqubits == 2
    assert c.gate_count() == 3


def test_perm_matrix():
    p = translation.perm_matrix(2)
    # |01> (int 1) <-> |10> (int 2)
    v = np.zeros(4)
    v[1] = 1
    np.testing.assert_allclose(p @ v, np.eye(4)[2], atol=1e-9)


def test_simple_compile_merge_prune():
    c = tc.Circuit(2)
    c.rz(0, theta=0.3)
    c.rz(0, theta=-0.3)  # cancels
    c.rx(1, theta=0.2)
    c.rx(1, theta=0.3)  # merges to 0.5
    c.cnot(0, 1)
    cc, info = simple_compile(c)
    assert cc.gate_count() == 2
    np.testing.assert_allclose(
        np.abs(np.vdot(np.asarray(cc.state()), np.asarray(c.state()))), 1.0, atol=1e-5
    )


def test_default_compile_u_replacement():
    c = tc.Circuit(1)
    c.u(0, theta=0.7, phi=0.2, lbd=0.9)
    cc, info = default_compile(c)
    assert "logical_physical_mapping" in info
    np.testing.assert_allclose(
        np.abs(np.vdot(np.asarray(cc.state()), np.asarray(c.state()))), 1.0, atol=1e-5
    )


def test_counts_toolbox():
    cnt = {"00": 50, "01": 25, "11": 25}
    m = counts_mod.marginal_count(cnt, [1])
    assert m == {"0": 50, "1": 50}
    v = counts_mod.count2vec(cnt)
    np.testing.assert_allclose(v, [0.5, 0.25, 0, 0.25])
    back = counts_mod.vec2count(v * 100, prune=True)
    assert back["00"] == 50
    e = counts_mod.expectation(cnt, z=[0])
    np.testing.assert_allclose(e, 0.5 + 0.25 - 0.25, atol=1e-9)
    assert counts_mod.kl_divergence(cnt, cnt) < 1e-6


def test_readout_mitigation_local():
    # fake noisy executor: apply known confusion to ideal counts
    p01, p10 = 0.1, 0.05  # P(read 1|0), P(read 0|1)

    def execute(circuits, shots):
        out = []
        for c in circuits:
            p = np.asarray(c.probability())
            p = p / p.sum()
            pt = p.reshape([2] * c.nqubits)
            m = np.array([[1 - p01, p10], [p01, 1 - p10]])
            for q in range(c.nqubits):
                pt = np.tensordot(m, pt, axes=[[1], [q]])
                pt = np.moveaxis(pt, 0, q)
            pflat = pt.reshape(-1)
            cnt = {}
            for i, pi in enumerate(pflat):
                if pi > 1e-9:
                    cnt[format(i, f"0{c.nqubits}b")] = int(round(pi * shots))
            out.append(cnt)
        return out

    mit = ReadoutMit(execute)
    mit.cals_from_system(2, shots=100000, method="local")
    # bell state measured with readout error
    c = tc.Circuit(2)
    c.h(0)
    c.cnot(0, 1)
    raw = execute([c], 100000)[0]
    raw_e = counts_mod.expectation(raw, z=[0, 1])
    mit_e = mit.expectation(raw, z=[0, 1], method="inverse")
    assert abs(mit_e - 1.0) < 0.02
    assert abs(raw_e - 1.0) > 0.1
    mit_e2 = mit.expectation(raw, z=[0, 1], method="square")
    assert abs(mit_e2 - 1.0) < 0.02
    mit_e3 = mit.expectation(raw, z=[0, 1], method="M3")
    assert abs(mit_e3 - 1.0) < 0.05


def test_cloud_local_provider():
    from tensorcircuit_ng_tpu import cloud

    cloud.set_provider("local")
    cloud.set_device("default")
    c = tc.Circuit(2)
    c.h(0)
    c.cnot(0, 1)
    t = cloud.submit_task(circuit=c, shots=100)
    res = t.results()
    assert sum(res.values()) == 100
    assert set(res.keys()) <= {"00", "11"}
    devices = cloud.list_devices()
    assert len(devices) >= 1


@pytest.mark.slow  # the tianyan batch-expectation test covers this path
def test_batch_expectation_ps_local_exact_vs_device():
    from tensorcircuit_ng_tpu.cloud.wrapper import batch_expectation_ps

    c = tc.Circuit(2)
    c.h(0)
    c.cnot(0, 1)
    pss = [[3, 3], [1, 1], [3, 0]]
    exact = batch_expectation_ps(c, pss, device=None)
    np.testing.assert_allclose(exact, [1.0, 1.0, 0.0], atol=1e-5)
    sampled = batch_expectation_ps(c, pss, device="local::default", shots=4096, with_rem=False)
    np.testing.assert_allclose(sampled, [1.0, 1.0, 0.0], atol=0.1)


def test_vis_tex_and_draw():
    from tensorcircuit_ng_tpu import vis

    c = sample_circuit()
    tex = vis.circuit_to_tex(c)
    assert "quantikz" in tex and "targ" in tex
    txt = vis.draw(c)
    assert "q0" in txt


def test_about():
    report = tc.about()
    assert "Jax version" in report


def test_utils_benchmark_and_alias():
    f = jax.jit(lambda x: jnp.sum(x * x))
    out, staging, running = utils.benchmark(f, jnp.ones(16), verbose=False)
    assert staging >= running

    @utils.arg_alias(alias_dict={"theta": ["angle"]})
    def g(theta=0.0):
        return theta

    assert g(angle=1.5) == 1.5


def test_symbol_circuit():
    import sympy as sp

    th = sp.Symbol("theta", real=True)
    c = tc.SymbolCircuit(2)
    c.rx(0, theta=th)
    expr = c.expectation_ps(z=[0])
    np.testing.assert_allclose(complex(expr.subs({th: 0.8})).real, np.cos(0.8), atol=1e-8)
    cc = c.to_circuit({th: 0.8})
    np.testing.assert_allclose(
        float(np.real(np.asarray(cc.expectation_ps(z=[0])))), np.cos(0.8), atol=1e-6
    )


@pytest.mark.slow  # flax bridge exercised end-to-end by the QML example; keras layer in the gate
def test_flax_quantum_layer():
    flax = pytest.importorskip("flax")
    n = 2

    def f(w, x):
        c = tc.Circuit(n)
        c.rx(0, theta=w[0] + x[0])
        c.rx(1, theta=w[1] + x[1])
        return jnp.real(c.expectation_ps(z=[0]))

    from tensorcircuit_ng_tpu.keras import QuantumLayer

    layer = QuantumLayer(f=f, weights_shape=(n,))
    params = layer.init(jax.random.PRNGKey(0), jnp.zeros(n))
    y = layer.apply(params, jnp.asarray([0.1, 0.2]))
    assert np.isfinite(float(y))
    g = jax.grad(lambda p, x: layer.apply(p, x))(params, jnp.asarray([0.1, 0.2]))
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_torch_quantum_net():
    torch = pytest.importorskip("torch")
    n = 2

    def f(w):
        c = tc.Circuit(n)
        c.rx(0, theta=w[0])
        c.rx(1, theta=w[1])
        c.cnot(0, 1)
        return jnp.real(c.expectation_ps(z=[1]))

    from tensorcircuit_ng_tpu.torchnn import QuantumNet

    net = QuantumNet(f, weights_shape=(n,))
    y = net()
    y.backward()
    for p in net.parameters():
        assert p.grad is not None


def test_stim_text_translation():
    import numpy as np
    import tensorcircuit_ng_tpu as tc
    from tensorcircuit_ng_tpu import translation as tr

    c = tc.StabilizerCircuit(3)
    c.h(0)
    c.cnot(0, 1)
    c.s(2)
    c.sd(2)
    c.cz(1, 2)
    text = tr.tc2stim(c)
    assert "S_DAG 2" in text and "CX 0 1" in text
    c2 = tr.stim2tc(text)
    for x, y in zip(c.get_tableau().stabilizers(), c2.get_tableau().stabilizers()):
        np.testing.assert_array_equal(x, y)
    # REPEAT blocks, TICK, measurements, pairwise 2q broadcast
    c3 = tr.stim2tc("H 0\nREPEAT 3 {\n CX 0 1\n CX 1 2\n}\nTICK\nM 0 1 2\n")
    assert len(c3._measure_record) == 3
    c4 = tr.stim2tc("H 0\nH 2\nCX 0 1 2 3\n")
    assert int(np.asarray(c4.expectation_ps(z=[0, 1]))) == 1


def test_qudit_subspace_two_site_gates():
    import numpy as np
    from tensorcircuit_ng_tpu.ops import quditgates as qg

    d = 3
    w = np.exp(2j * np.pi / d)
    s = np.asarray(qg.s_matrix_func(d))
    np.testing.assert_allclose(
        np.diag(s), [w ** (j * (j + 1) / 2) for j in range(d)], atol=1e-6
    )
    m = np.asarray(qg.rzz_matrix_func(d, 0.7, 0, 1, 0, 2))
    np.testing.assert_allclose(m @ m.conj().T, np.eye(9), atol=1e-6)
    np.testing.assert_allclose(m[0, 0], np.exp(-0.35j), atol=1e-6)
    np.testing.assert_allclose(m[5, 5], np.exp(0.35j), atol=1e-6)
    m2 = np.asarray(qg.rxx_matrix_func(d, 0.7))
    np.testing.assert_allclose(m2 @ m2.conj().T, np.eye(9), atol=1e-6)


def test_openqasm_methods_and_compose():
    import numpy as np
    import tensorcircuit_ng_tpu as tc

    c = tc.Circuit(3)
    c.h(0)
    c.cnot(0, 1)
    c.rx(2, theta=0.3)
    q = c.to_openqasm()
    assert "OPENQASM 2.0" in q
    c2 = tc.Circuit.from_openqasm(q)
    np.testing.assert_allclose(np.asarray(c2.state()), np.asarray(c.state()), atol=1e-5)
    assert c.get_positional_logical_mapping() == {0: 0, 1: 1, 2: 2}
    inner = tc.Circuit(2)
    inner.h(0)
    inner.cnot(0, 1)
    big = tc.Circuit(4)
    big.compose(inner, indices=[2, 3])
    ref = tc.Circuit(4)
    ref.h(2)
    ref.cnot(2, 3)
    np.testing.assert_allclose(np.asarray(big.state()), np.asarray(ref.state()), atol=1e-6)


def test_symbolgates_exact_identities():
    import sympy
    import numpy as np

    from tensorcircuit_ng_tpu.ops import symbolgates as sg

    # HZH = X exactly
    assert (sg.sym_h() * sg.sym_z() * sg.sym_h() - sg.sym_x()).norm() == 0
    # S^2 = Z, T^2 = S
    assert sympy.simplify((sg.sym_s() ** 2 - sg.sym_z()).norm()) == 0
    assert sympy.simplify((sg.sym_t() ** 2 - sg.sym_s()).norm()) == 0
    # rz(theta) rz(-theta) = I symbolically
    th = sympy.Symbol("theta", real=True)
    prod = sympy.simplify(sg.sym_rz(th) * sg.sym_rz(-th))
    assert prod == sympy.eye(2)
    # euler decomposition matches numeric u gate
    from tensorcircuit_ng_tpu.ops.gates import u_matrix

    vals = {"t": 0.3, "p": 0.5, "l": 0.7}
    t, p, l = sympy.symbols("t p l", real=True)
    m = sg.sym_u(t, p, l).subs({t: vals["t"], p: vals["p"], l: vals["l"]})
    np.testing.assert_allclose(
        np.array(m.evalf(), dtype=complex),
        np.asarray(u_matrix(0.3, 0.5, 0.7)),
        atol=1e-6,
    )


def test_openqasm_with_fused_items_and_multicz():
    import numpy as np
    import jax.numpy as jnp

    import tensorcircuit_ng_tpu as tc

    c = tc.Circuit(3)
    c.h_layer()
    c.rzz_product([(0, 1)], jnp.asarray([0.3]))
    c.rx_layer(jnp.asarray([0.1, 0.2, 0.3]))
    c.multicz(0, 1, 2)
    c2 = tc.Circuit.from_openqasm(c.to_openqasm())
    np.testing.assert_allclose(
        np.asarray(c2.state()), np.asarray(c.state()), atol=1e-4
    )


@pytest.mark.slow  # heavy; fast sibling covers the path
def test_save_params_both_orders(tmp_path):
    import numpy as np
    import jax.numpy as jnp

    from tensorcircuit_ng_tpu import experimental as ex

    ps = {"a": jnp.ones(3), "b": jnp.asarray([2.0])}
    ex.save_params(ps, str(tmp_path / "c1"))
    np.testing.assert_allclose(np.asarray(ex.load_params(str(tmp_path / "c1"))["a"]), 1.0)
    ex.save_params(str(tmp_path / "c2"), ps)
    np.testing.assert_allclose(np.asarray(ex.load_params(str(tmp_path / "c2"))["b"]), 2.0)


# ---------------- round-1 parity batch: periphery surface ----------------


def test_translation_parity():
    from tensorcircuit_ng_tpu import translation as tr

    t = np.random.rand(2, 2) + 1j * np.random.rand(2, 2)
    np.testing.assert_allclose(tr.json_to_tensor(tr.tensor_to_json(t)), t)
    assert tr.ctrl_str2ctrl_state("5", 3) == [1, 0, 1]
    eqasm = "\n".join(
        ["h", "h", "q0,q1", "h", "h", "h", "bs 0 H q0", "bs 0 RZ_2 q0", "bs 0 CZ (q0, q1)", "end"]
    )
    c = tr.eqasm2tc(eqasm, nqubits=2)
    assert [i["name"] for i in c.to_qir()] == ["h", "rz", "cz"]


def test_abstractcircuit_json_draw_qsim(tmp_path):
    c = tc.Circuit(3)
    c.h(0); c.cx(0, 1); c.rz(2, theta=0.3)
    s = c.to_json()
    c2 = tc.Circuit.from_json(s)
    np.testing.assert_allclose(np.asarray(c2.state()), np.asarray(c.state()), atol=1e-6)
    f = str(tmp_path / "c.json")
    c.to_json(file=f)
    c3 = tc.Circuit.from_json_file(f)
    np.testing.assert_allclose(np.asarray(c3.state()), np.asarray(c.state()), atol=1e-6)
    assert "h" in str(c.draw())
    assert "\\" in c.vis_tex()
    assert tc.Circuit.standardize_gate("CX") == "cnot"
    qs = str(tmp_path / "c.qsim")
    open(qs, "w").write("2\n0 h 0\n1 cz 0 1\n2 rx 1 0.5\n")
    c4 = tc.Circuit.from_qsim_file(qs)
    assert [i["name"] for i in c4.to_qir()] == ["h", "cz", "rx"]
    c.pauli_instruction(0, p=[0.1, 0, 0])
    c.mr_instruction(1)
    c.depolarizing_instruction(2, p=0.05)
    assert len([e for e in c._extra_qir if e["name"] in ("pauli", "mr", "depolarizing")]) == 3


def test_compiler_pass_parity():
    from tensorcircuit_ng_tpu.compiler import simple_compiler as sc

    c = tc.Circuit(2)
    c.rx(0, theta=0.4); c.ry(1, theta=0.7); c.u(0, theta=0.3, phi=0.2, lbd=0.1); c.cx(0, 1)
    psi0 = np.asarray(c.state())
    for passf in (sc.replace_r, sc.replace_u, sc.prune, sc.merge):
        psi2 = np.asarray(passf(c).state())
        ph = psi2[np.argmax(np.abs(psi0))] / psi0[np.argmax(np.abs(psi0))]
        np.testing.assert_allclose(psi2, ph * psi0, atol=1e-5)
        assert isinstance(passf(c.to_qir()), list)
    names = [i["name"] for i in sc.replace_r(c).to_qir()]
    assert "rx" not in names and "ry" not in names


def test_interfaces_tensortrans_parity():
    import torch
    from tensorcircuit_ng_tpu.interfaces import tensortrans as tt
    from tensorcircuit_ng_tpu.interfaces.jax import create_jax_function

    t = torch.ones(3)
    assert tt.which_backend(t, return_backend=False) == "torch"
    jv = tt.tensor_to_backend_jittable(t)
    assert "jax" in type(jv).__module__
    back = tt.general_args_to_backend({"a": t}, target_backend="jax", enable_dlpack=False)
    assert "jax" in type(back["a"]).__module__
    from tensorcircuit_ng_tpu.ops.gates import Gate

    trg = tt.args_to_tensor(lambda x: jnp.trace(x), argnums=[0], gate_to_tensor=True)
    assert abs(float(jnp.real(trg(Gate(np.eye(2))))) - 2) < 1e-6
    fn = create_jax_function(lambda x: jnp.sum(x**2), jit=True)
    assert abs(float(fn(jnp.ones(3))) - 3) < 1e-6


def test_gates_helpers_parity():
    from tensorcircuit_ng_tpu.ops import gates as G

    th, ph, lb = 0.7, 0.4, -0.3
    m = np.asarray(G.u_matrix(th, ph, lb))
    t2, p2, l2 = G.get_u_parameter(m)
    m2 = np.asarray(G.u_matrix(t2, p2, l2))
    phase = m2[0, 0] / m[0, 0]
    np.testing.assert_allclose(m2, phase * m, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(G.rgate_matrix(0.3, 0.4, 0.5)),
        np.asarray(G.rgate_theoretical(0.3, 0.4, 0.5).matrix()),
        atol=1e-6,
    )
    g2 = G.random_two_qubit_gate()
    u = np.asarray(g2.matrix())
    np.testing.assert_allclose(u @ u.conj().T, np.eye(4), atol=1e-5)
    hi = np.asarray(G.GATES["h"].ided()().matrix())
    np.testing.assert_allclose(hi, np.kron(np.eye(2), np.asarray(G.GATES["h"]().matrix())), atol=1e-6)
    assert "bmatrix" in G.bmatrix(np.eye(2))


@pytest.mark.slow  # cloud local provider test covers the surface in the fast gate
def test_cloud_parity():
    from tensorcircuit_ng_tpu.cloud import apis, utils, wrapper
    from tensorcircuit_ng_tpu.cloud.abstraction import TaskUnfinished, TCException

    assert apis.b64decode_s(apis.b64encode_s("secret")) == "secret"
    p = apis.set_provider("local")
    d = apis.set_device("default")
    c = tc.Circuit(2); c.h(0); c.cx(0, 1)
    t = apis.submit_task(device=d, circuit=c, shots=500)
    res = t.results()
    assert sum(res.values()) == 500 and set(res) <= {"00", "11"}
    t.add_details(logical_physical_mapping={0: 0})
    assert t.get_logical_physical_mapping() == {0: 0}
    with pytest.raises(TCException):
        raise TaskUnfinished("abc", "pending")
    v = wrapper.sample_expectation_ps(c, z=[0, 1], shots=2000)
    assert abs(v - 1.0) < 0.1
    calls = {"n": 0}

    @utils.reconnect(tries=3, sleep=0.0)
    def flaky():
        calls["n"] += 1
        if calls["n"] < 2:
            raise ConnectionError("down")
        return 7

    assert flaky() == 7


def test_readout_mitigation_parity():
    from tensorcircuit_ng_tpu.results.readout_mitigation import ReadoutMit

    np.random.seed(0)
    conf = {
        0: np.array([[0.97, 0.05], [0.03, 0.95]]),
        1: np.array([[0.98, 0.1], [0.02, 0.9]]),
    }

    def execute(circuits, shots):
        out = []
        for c in circuits:
            p = np.abs(np.asarray(c.state())) ** 2
            a = np.kron(conf[0], conf[1])
            p2 = a @ p
            cnt = np.random.multinomial(shots, p2 / p2.sum())
            out.append({format(i, "02b"): int(v) for i, v in enumerate(cnt) if v})
        return out

    mit = ReadoutMit(execute)
    mit.cals_from_system([0, 1], shots=60000)
    assert len(mit.local_miti_readout_circ()) == 2
    assert len(mit.global_miti_readout_circ()) == 4
    np.testing.assert_allclose(mit.get_matrix(), np.kron(conf[0], conf[1]), atol=0.02)
    c = tc.Circuit(2); c.h(0); c.cx(0, 1)
    raw = execute([c], 60000)[0]
    q = mit.apply_readout_mitigation(raw)
    assert abs(q.get("00", 0) / 60000 - 0.5) < 0.03
    cnts2, phys = mit.mapping_preprocess({"01": 7}, [0, 1], {0: 1, 1: 0}, {0: 0, 1: 1})
    assert cnts2 == {"10": 7}


def test_symbolgates_and_symbolcircuit_parity():
    import sympy as sp
    from tensorcircuit_ng_tpu.ops import symbolgates as sg
    from tensorcircuit_ng_tpu.ops import gates as G

    th = 0.37
    for s_, g in (
        (sg.sym_rxx(th), G.rxx_matrix(th)),
        (sg.sym_cphase(th), G.cphase_matrix(th)),
        (sg.sym_iswap(0.5), G.iswap_matrix(0.5)),
        (sg.sym_r(0.3, 0.4, 0.5), G.rgate_matrix(0.3, 0.4, 0.5)),
    ):
        sn = np.asarray(sp.Matrix(s_).evalf(), dtype=complex)
        np.testing.assert_allclose(sn, np.asarray(g).reshape(sn.shape), atol=1e-6)
    theta = sp.Symbol("theta")
    c = tc.SymbolCircuit(2)
    c.h(0); c.rx(1, theta=theta)
    # bind returns a SymbolCircuit (reference partial-binding semantics);
    # to_circuit gives the numeric jittable Circuit
    cb = c.bind({theta: 0.5})
    assert cb.free_symbols() == set()
    cn = c.to_circuit({theta: 0.5})
    c2 = tc.Circuit(2); c2.h(0); c2.rx(1, theta=0.5)
    np.testing.assert_allclose(np.asarray(cn.state()), np.asarray(c2.state()), atol=1e-6)
    with pytest.raises(ValueError):
        c.measure(0)


def test_timeevol_vis_misc_parity():
    from tensorcircuit_ng_tpu import timeevol as te
    from tensorcircuit_ng_tpu.vis import gate_name_trans
    import scipy.linalg as sl

    assert gate_name_trans("ccnot") == (2, "not")
    h = np.diag([0.0, 1.0, 2.0, 3.0]).astype(np.complex64)
    psi0 = np.ones(4, dtype=np.complex64) / 2
    out = np.asarray(te.expm_multiply_evol(jnp.asarray(h), jnp.asarray(psi0), [0.5, 1.0]))
    want = np.stack([sl.expm(-1j * t * h) @ psi0 for t in (0.5, 1.0)])
    np.testing.assert_allclose(out, want, atol=1e-5)
    m, s = te.estimate_expm_multiply_parameters(1.0, 5.0)
    assert m > 0 and s >= 1


def test_torchnn_class_and_basecircuit_standins():
    import torch
    from tensorcircuit_ng_tpu.torchnn import QuantumNet

    net = QuantumNet(lambda w: jnp.real(jnp.sum(w**2)), [2, 3])
    y = net()
    y.backward()
    assert net.ws[0].grad is not None
    c = tc.Circuit(2)
    c.h(0); c.cx(0, 1)
    assert abs(float(np.asarray(c.outcome_probability("11"))) - 0.5) < 1e-6
    assert "digraph" in c.to_graphviz()
    from tensorcircuit_ng_tpu.templates.lattice import SquareLattice, CustomizeLattice

    sq = SquareLattice([2, 2], pbc=False)
    assert len(sq.sites) == 4 and len(sq.get_all_pairs()) == 4
    cl = CustomizeLattice.from_lattice(sq)
    cl.add_sites(["x"], [[9.0, 9.0]])
    cl.remove_sites(["x"])
    assert cl.num_sites == 4


@pytest.mark.slow  # quop/linop parity; core QuOperator algebra stays in test_quantum
def test_quop_linop_contractor_parity():
    from tensorcircuit_ng_tpu import quantum as qu
    from tensorcircuit_ng_tpu.core import contractor as ct
    from tensorcircuit_ng_tpu.core.einsum_ir import EinsumIR
    from tensorcircuit_ng_tpu.models.mps_base import FiniteMPS

    h = np.diag([1.0, 2.0, 3.0, 4.0])
    op = qu.LinearOperator(h)
    v = np.ones(4)
    np.testing.assert_allclose(op.matvec(v), h @ v)
    qv = qu.QuVector.from_tensor(np.ones((2, 2)) / 2.0)
    assert qv.space == (2, 2)
    rho = qv.reduced_density([1])
    assert abs(float(np.real(np.trace(np.asarray(rho.eval_matrix())))) - 1) < 1e-6
    a = np.random.rand(2, 3); b = np.random.rand(3, 4); cc = np.random.rand(4, 2)
    ir = EinsumIR(inputs=[(0, 1), (1, 2), (2, 3)], output=(0, 3), size_dict={0: 2, 1: 3, 2: 4, 3: 2}, tensors=[a, b, cc])
    want = a @ b @ cc
    np.testing.assert_allclose(np.asarray(ct.plain_contractor(ir)), want, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ct.contract_ir(ir, optimizer=ct.OMEOptimizer(steps=30))), want, atol=1e-6)
    # FiniteMPS two-site update
    mc = tc.MPSCircuit(3)
    mc.h(0); mc.cx(0, 1)
    fm = FiniteMPS(mc.tensors, center_position=0)
    fm.apply_two_site_gate(np.diag([1.0, 1.0, 1.0, -1.0]), 1, 2, max_singular_values=4)
    fm.position(2)
    assert fm.check_canonical() < 1e-5


@pytest.mark.slow  # heavy; fast sibling covers the path
def test_backend_parity_batch():
    """Reference abstract_backend/jax_backend method surface (SURVEY 2.1)."""
    import tensorcircuit_ng_tpu as tc

    b = tc.backend
    assert bool(b.all(jnp.array([True, True])))
    assert not bool(b.any(jnp.array([False, False])))
    assert list(np.asarray(b.reverse(jnp.arange(3)))) == [2, 1, 0]
    assert list(np.asarray(b.sort(jnp.array([3, 1, 2])))) == [1, 2, 3]
    assert list(np.asarray(b.argsort(jnp.array([3, 1, 2])))) == [1, 2, 0]
    v, i = b.top_k(jnp.array([1.0, 5.0, 3.0]), 2)
    assert list(np.asarray(i)) == [1, 2]
    assert int(np.asarray(b.popc(jnp.array([7], dtype=jnp.uint32)))[0]) == 3
    assert int(b.left_shift(jnp.array(1), jnp.array(3))) == 8
    assert int(b.right_shift(jnp.array(8), jnp.array(2))) == 2
    assert int(b.bitwise_xor(jnp.array(5), jnp.array(3))) == 6
    assert complex(b.i("complex64")) == 1j
    assert b.reshaped(jnp.zeros(27), 3).shape == (3, 3, 3)
    with pytest.raises(ValueError):
        b.reshaped(jnp.zeros(10), 3)
    assert b.expand_dims(jnp.zeros((2, 3)), 1).shape == (2, 1, 3)
    assert b.ones_like(jnp.zeros((2,))).sum() == 2
    assert b.repeat(jnp.array([1, 2]), 2).shape == (4,)
    xs, ys = b.meshgrid(jnp.arange(2), jnp.arange(3))
    assert xs.shape == (3, 2)
    assert int(b.floor_divide(jnp.array(7), jnp.array(2))) == 3

    a = np.random.randn(6, 6).astype(np.float32)
    h = (a + a.T) / 2 + 6 * np.eye(6, dtype=np.float32)
    s = np.asarray(b.sqrtmh(jnp.asarray(h), psd=True))
    np.testing.assert_allclose(s @ s, h, atol=1e-4)

    carry, ys = b.jaxy_scan(lambda c, x: (c + x, c), jnp.array(0.0), jnp.arange(4.0))
    assert float(carry) == 6.0

    n, k = 40, 3
    a = np.random.randn(n, n).astype(np.float32)
    h = (a + a.T) / 2 + n * np.eye(n, dtype=np.float32)
    theta, u, _ = b.lobpcg_standard(
        jnp.asarray(h), jnp.asarray(np.random.randn(n, k), dtype=jnp.float32), m=100
    )
    np.testing.assert_allclose(
        np.sort(np.asarray(theta)), np.sort(np.linalg.eigvalsh(h)[-k:]), rtol=1e-3
    )

    from scipy.special import jv as scipy_jv

    out = np.asarray(b.special_jv(5, jnp.asarray(1.7, dtype=jnp.float32), 30))
    np.testing.assert_allclose(out, [scipy_jv(q, 1.7) for q in range(5)], atol=1e-5)

    assert float(b.matvec(jnp.eye(3), jnp.arange(3.0))[2]) == 2.0


@pytest.mark.slow  # M3 math covered by test_calibrating + smaller readout tests in the gate
def test_readout_mitigation_m3_scalable():
    """M3 subspace solvers: exactness at small n, 30-qubit scalability.

    The reduced matrix is built rank-structured from per-qubit cals
    (reference results/readout_mitigation.py:705 _direct_solver / :722
    _matvec_solver roles) — the 2^n kron is never materialized.
    """
    import time
    from collections import Counter

    rng = np.random.default_rng(0)
    # --- small n: reduced matrix == column-normalized kron submatrix ----
    n = 4
    cals = {
        q: np.array(
            [[1 - 0.03 * (q + 1), 0.02 * (q + 1)], [0.03 * (q + 1), 1 - 0.02 * (q + 1)]]
        )
        for q in range(n)
    }
    mit = ReadoutMit(lambda cs, s: None)
    mit.set_local_cals(cals)
    ideal = np.zeros(2**n)
    ideal[0] = 0.5
    ideal[-1] = 0.5
    noisy = mit.get_matrix() @ ideal
    shots = 200000
    cnt = {
        format(i, f"0{n}b"): int(round(p * shots))
        for i, p in enumerate(noisy)
        if p > 1e-6
    }
    a_red, keys = mit.reduced_cal_matrix(cnt, list(range(n)))
    idx = [int(k, 2) for k in keys]
    a_ref = mit.get_matrix()[np.ix_(idx, idx)]
    a_ref = a_ref / a_ref.sum(0, keepdims=True)
    np.testing.assert_allclose(a_red, a_ref, atol=1e-12)
    for method in ("M3_direct", "M3_iterative"):
        out = mit.apply_correction(cnt, list(range(n)), method=method)
        assert abs(out.get("0" * n, 0) / shots - 0.5) < 0.02
        assert abs(out.get("1" * n, 0) / shots - 0.5) < 0.02

    # --- 30 qubits, 10k shots: must stay fast without 2^30 anything -----
    n = 30
    p10, p01 = 0.03, 0.04
    cals = {q: np.array([[1 - p10, p01], [p10, 1 - p01]]) for q in range(n)}
    mit = ReadoutMit(lambda cs, s: None)
    mit.set_local_cals(cals)
    samples = []
    for _ in range(10000):
        b = 0 if rng.random() < 0.5 else (1 << n) - 1
        bb = 0
        for q in range(n):
            bit = (b >> q) & 1
            p = p10 if bit == 0 else 1 - p01
            bb |= (1 if rng.random() < p else 0) << q
        samples.append(bb)
    cnt = {format(k, f"0{n}b"): v for k, v in Counter(samples).items()}
    raw0 = sum(v for k, v in cnt.items() if k == "0" * n) / 10000
    t0 = time.time()
    out = mit.apply_correction(cnt, list(range(n)), method="M3_auto")
    dt = time.time() - t0
    p0 = out.get("0" * n, 0) / 10000
    p1 = out.get("1" * n, 0) / 10000
    assert dt < 10.0  # warm solve ~0.3 s; headroom for CI contention
    assert abs(p0 - p1) < 0.05  # symmetric GHZ recovered
    assert p0 > raw0 + 0.1  # mitigation moved weight back substantially
    # hamming-truncated iterative path agrees with direct
    out2 = mit.apply_correction(
        cnt, list(range(n)), method="M3_iterative", distance=8
    )
    assert abs(out2.get("0" * n, 0) / 10000 - p0) < 0.02
