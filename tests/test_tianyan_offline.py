"""Offline tianyan provider: QCIS translation, native lowering, mock round trip.

The reference proves this layer is testable without network (714 LoC of
mocked-HTTP tests in tests/test_tianyan.py); here the mock platform executes
submitted QCIS text on the local simulator, closing a true submit -> counts
round trip through the textual interface.
"""

import numpy as np
import pytest

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu.cloud import tianyan as ty
from tensorcircuit_ng_tpu.cloud.abstraction import Device, Provider


def bell():
    c = tc.Circuit(2)
    c.h(0)
    c.cnot(0, 1)
    return c


def test_qcis_translation_matches_circuit():
    """QCIS text parsed back through the interpreter == original state."""
    rng = np.random.default_rng(0)
    c = tc.Circuit(3)
    c.h(0)
    c.cnot(0, 1)
    c.cy(1, 2)
    c.swap(0, 2)
    c.rx(0, theta=0.3)
    c.ry(1, theta=-0.8)
    c.rz(2, theta=1.1)
    c.t(0)
    c.sd(1)
    c.toffoli(0, 1, 2)
    c.iswap(0, 1)
    qcis = ty.circuit_to_qcis(c)
    c2, measured = ty.parse_qcis(qcis)
    psi1 = np.asarray(c.state())
    psi2 = np.asarray(c2.state())
    # equality up to global phase
    k = np.argmax(np.abs(psi1))
    phase = psi2[k] / psi1[k]
    np.testing.assert_allclose(np.abs(phase), 1.0, atol=1e-5)
    np.testing.assert_allclose(psi2, psi1 * phase, atol=1e-5)
    assert measured == [0, 1, 2]


def test_native_lowering_preserves_state():
    """lower_to_native emits only {X2P,X2M,Y2P,Y2M,RZ,CZ}; same state."""
    c = tc.Circuit(2)
    c.h(0)
    c.cnot(0, 1)
    c.rx(0, theta=0.7)
    c.ry(1, theta=-0.4)
    c.t(0)
    c.z(1)
    qcis = ty.circuit_to_qcis(c)
    native = ty.lower_to_native(qcis)
    ops = {ln.split()[0] for ln in native.splitlines() if ln.strip()}
    assert ops <= {"X2P", "X2M", "Y2P", "Y2M", "RZ", "CZ", "M"}
    c1, _ = ty.parse_qcis(qcis)
    c2, _ = ty.parse_qcis(native)
    psi1 = np.asarray(c1.state())
    psi2 = np.asarray(c2.state())
    k = np.argmax(np.abs(psi1))
    phase = psi2[k] / psi1[k]
    np.testing.assert_allclose(psi2, psi1 * phase, atol=1e-5)


class MockPlatform:
    """Simulates the TianYan service: stores experiments, executes QCIS."""

    def __init__(self, machines=None, config=None, fail_ids=()):
        self.machines = machines or [{"name": "tianyan_sim"}, {"name": "tianyan504"}]
        self.config = config or {}
        self.experiments = {}
        self.fail_ids = set(fail_ids)
        self.counter = 0

    def query_machine_list(self):
        return self.machines

    def download_config(self, machine):
        return self.config.get(machine, {})

    def submit_experiment(self, qcis, machine, shots, exp_name):
        self.counter += 1
        tid = f"exp{self.counter}"
        self.experiments[tid] = (qcis, shots)
        return tid

    def query_experiment(self, tid):
        if tid in self.fail_ids:
            return [{"experimentTaskId": tid, "state": "failed", "err": "calibration"}]
        qcis, shots = self.experiments[tid]
        counts = ty.simulate_qcis(qcis, shots=shots, seed=42)
        # TianYan wire format: [measure_order, shot1_bits, shot2_bits, ...]
        shots_list = [[0, 1]] if False else []
        result = [sorted(range(len(next(iter(counts)))))]
        for bits, cnt in counts.items():
            result.extend([[int(b) for b in bits]] * cnt)
        return [{"experimentTaskId": tid, "resultStatus": result}]


@pytest.fixture
def mock_platform():
    pf = MockPlatform()
    ty.set_platform(pf)
    yield pf
    ty.set_platform(None)


def test_submit_counts_round_trip(mock_platform):
    dev = Device("tianyan_sim", Provider.from_name("tianyan"))
    task = ty.submit_task(dev, circuit=bell(), shots=4000)
    details = ty.get_task_details(task)
    assert details["state"] == "completed"
    cnt = task.results()
    tot = sum(cnt.values())
    assert tot == 4000
    p00 = cnt.get("00", 0) / tot
    p11 = cnt.get("11", 0) / tot
    assert abs(p00 - 0.5) < 0.05 and abs(p11 - 0.5) < 0.05
    assert cnt.get("01", 0) + cnt.get("10", 0) == 0
    # batch submission
    tasks = ty.submit_task(dev, circuit=[bell(), bell()], shots=100)
    assert len(tasks) == 2
    # resubmission reuses the stored source
    t2 = ty.resubmit_task(task)
    ty.get_task_details(t2)
    assert sum(t2.results().values()) == 4000


def test_topology_validation(mock_platform):
    mock_platform.config["tianyan504"] = {
        "overview": {
            "coupler_map": {"c01": ["Q0", "Q1"], "c12": ["Q1", "Q2"]},
            "qubits": ["Q0", "Q1", "Q2", "Q3"],
            "disabledQubits": "Q3",
        }
    }
    dev = Device("tianyan504", Provider.from_name("tianyan"))
    # valid: uses connected pair (0,1)
    ty.submit_task(dev, circuit=bell(), shots=10)
    # invalid: (0, 2) unconnected
    bad = tc.Circuit(3)
    bad.h(0)
    bad.cnot(0, 2)
    with pytest.raises(ValueError, match="no coupler"):
        ty.submit_task(dev, circuit=bad, shots=10)
    # invalid: disabled qubit
    bad2 = tc.Circuit(4)
    bad2.x(3)
    with pytest.raises(ValueError, match="not usable"):
        ty.submit_task(dev, circuit=bad2, shots=10)
    props = ty.get_device_properties(dev)
    assert props["qubits"] == [0, 1, 2]
    assert (0, 1) in props["coupling_map"]


def test_failed_state_parsing(mock_platform):
    mock_platform.fail_ids.add("exp1")
    dev = Device("tianyan_sim", Provider.from_name("tianyan"))
    task = ty.submit_task(dev, circuit=bell(), shots=10)
    details = ty.get_task_details(task)
    assert details["state"] == "failed"
    assert "calibration" in details["err"]


@pytest.mark.slow  # submit/counts roundtrip + qcis translation stay in the fast gate
def test_batch_expectation_ps_local_with_mitigation():
    """batch_expectation_ps through the local provider incl. readout path."""
    from tensorcircuit_ng_tpu.cloud import wrapper

    c = tc.Circuit(2)
    c.h(0)
    c.cnot(0, 1)
    exact = wrapper.batch_expectation_ps(c, [[3, 3], [1, 1]], device=None)
    np.testing.assert_allclose(exact, [1.0, 1.0], atol=1e-5)
    vals = wrapper.batch_expectation_ps(
        c, [[3, 3], [1, 1]], device="local::default", shots=40000, with_rem=True
    )
    np.testing.assert_allclose(vals, [1.0, 1.0], atol=0.05)
