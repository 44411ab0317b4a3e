"""Offline tencent-provider suite: full submit->counts round trip through a
mock transport (zero network), mirroring the reference's mocked-HTTP tests
for ``cloud/tencent.py`` by behavior."""

import numpy as np
import pytest

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu.cloud import tencent as tx
from tensorcircuit_ng_tpu.cloud import utils as cloud_utils
from tensorcircuit_ng_tpu.cloud.abstraction import Device, Provider


class MockQOS:
    """In-memory stand-in for the tencent QOS API."""

    def __init__(self):
        self.tasks = {}
        self.counter = 0
        self.devices = [
            {"id": "simulator:tc", "type": "SIMULATOR", "state": "on"},
            {"id": "9gmon", "type": "CHIP", "state": "on"},
        ]
        self.device_detail = {
            "id": "9gmon",
            "type": "CHIP",
            "state": "on",
            "links": [
                {"A": 0, "B": 1, "CZErrRate": 0.01, "at": 1673605888},
                {"A": 1, "B": 2, "CZErrRate": 0.02, "at": 1673605888},
            ],
            "bits": [
                {"Qubit": 0, "T1": 30.0, "T2": 5.0},
                {"Qubit": 1, "T1": 32.0, "T2": 6.0},
                {"Qubit": 2, "T1": 28.0, "T2": 4.5},
            ],
            "langs": ["OPENQASM"],
        }

    def _execute(self, source, shots):
        from tensorcircuit_ng_tpu.translation import qasm2tc

        c = qasm2tc(source)
        p = np.abs(np.asarray(c.state())) ** 2
        p = p / p.sum()
        rng = np.random.default_rng(11)
        draws = rng.choice(len(p), size=shots, p=p)
        counts = {}
        for s in draws:
            key = format(int(s), f"0{c._nqubits}b")
            counts[key] = counts.get(key, 0) + 1
        return counts

    def _submit_one(self, job):
        if "rx(" in job["source"]:
            # emulate a backend rejection for an uncalibrated gate
            return {"err": "gate rx not supported on this device"}
        self.counter += 1
        tid = f"qos-{self.counter}"
        self.tasks[tid] = {
            "id": tid,
            "state": "completed",
            "at": 1666752095915849,
            "ts": {"completed": 1666752099915849, "pending": 1666752095915849},
            "shots": job["shots"],
            "source": job["source"],
            "device": job["device"],
            "result": {"counts": self._execute(job["source"], job["shots"])},
            "optimization": {"pairs": {"0": 0, "1": 1}},
        }
        return {"id": tid, "state": "pending"}

    def __call__(self, method, url, body, headers):
        assert headers["Authorization"].startswith("Bearer "), headers
        endpoint = url.split("/qos/api/")[1].split("?")[0]
        if endpoint == "device/find":
            return {"devices": self.devices}
        if endpoint == "device/detail":
            if body["id"] != "9gmon":
                return {"err": f"unknown device {body['id']}"}
            return {"device": self.device_detail}
        if endpoint == "task/submit":
            jobs = body if isinstance(body, list) else [body]
            return {"tasks": [self._submit_one(j) for j in jobs]}
        if endpoint == "task/detail":
            t = self.tasks.get(body["id"])
            return {"task": t} if t else {"err": "task not found"}
        if endpoint == "task/find":
            sel = [
                {"id": t["id"], "device": t["device"]}
                for t in self.tasks.values()
                if body.get("device") is None or t["device"].startswith(body["device"])
            ]
            return {"tasks": sel}
        if endpoint == "task/start":
            old = self.tasks[body["id"]]
            fresh = self._submit_one({k: old[k] for k in ("device", "shots", "source")})
            return {"tasks": [fresh]}
        if endpoint == "task/remove":
            self.tasks.pop(body["id"], None)
            return {"ok": True}
        raise AssertionError(f"unexpected endpoint {endpoint}")


@pytest.fixture
def qos():
    server = MockQOS()
    cloud_utils.set_transport(server)
    from tensorcircuit_ng_tpu.cloud import apis

    apis.set_token("faketoken-123", provider="tencent")
    yield server
    cloud_utils.set_transport(None)


def bell():
    c = tc.Circuit(2)
    c.h(0)
    c.cnot(0, 1)
    return c


def test_list_devices_and_properties(qos):
    devs = tx.list_devices()
    assert [d.name for d in devs] == ["simulator:tc", "9gmon"]
    props = tx.list_properties(devs[1])
    assert props["links"][(0, 1)]["CZErrRate"] == 0.01
    assert props["bits"][2]["T1"] == 28.0
    assert "cz" in props["native_gates"]
    with pytest.raises(RuntimeError, match="unknown device"):
        tx.list_properties(Device("nope", Provider.from_name("tencent")))


def test_submit_and_counts_roundtrip(qos):
    dev = Device("9gmon", Provider.from_name("tencent"))
    task = tx.submit_task(dev, circuit=bell(), shots=4096)
    det = tx.get_task_details(task)
    assert det["state"] == "completed"
    counts = det["results"]
    assert set(counts) == {"00", "11"}
    tot = sum(counts.values())
    assert abs(counts["00"] / tot - 0.5) < 0.05
    # task object absorbed the results + mapping
    assert task.results() == counts
    assert task.get_logical_physical_mapping() == {0: 0, 1: 1}
    # QOS option bitmask rode the device string (defaults: mapping+decomp = 3)
    assert qos.tasks[task.id_]["device"] == "9gmon?o=3"


def test_qos_options_and_dry_run(qos):
    dev = Device("9gmon", Provider.from_name("tencent"))
    t = tx.submit_task(
        dev,
        circuit=bell(),
        shots=16,
        enable_qos_qubit_mapping=False,
        enable_qos_gate_decomposition=False,
        enable_qos_initial_mapping=True,
        qos_dry_run=True,
    )
    assert qos.tasks[t.id_]["device"] == "9gmon?o=4&dry"
    # a device name already carrying options passes through
    pre = Device("9gmon?o=7", Provider.from_name("tencent"))
    t2 = tx.submit_task(pre, circuit=bell(), shots=16)
    assert qos.tasks[t2.id_]["device"] == "9gmon?o=7"


def test_batch_submission_partial_failure(qos):
    dev = Device("9gmon", Provider.from_name("tencent"))
    good = bell()
    badc = tc.Circuit(1)
    badc.rx(0, theta=0.3)  # mock backend rejects rx
    tasks = tx.submit_task(dev, circuit=[good, badc, good], shots=[64, 64, 128])
    assert len(tasks) == 2  # bad one warned + skipped
    shots = sorted(qos.tasks[t.id_]["shots"] for t in tasks)
    assert shots == [64, 128]
    with pytest.raises(ValueError, match="All tasks submitted failed"):
        tx.submit_task(dev, circuit=[badc, badc], shots=8)


def test_phase_gate_folding(qos):
    c = tc.Circuit(1)
    c.h(0)
    c.s(0)
    c.t(0)
    qasm = tx._fold_phase_gates(c.to_openqasm())
    assert "s q[0];" in qasm and "t q[0];" in qasm
    assert "rz" not in qasm
    assert tx._fold_phase_gates("rz(-pi/2) q[1];") == "sdg q[1];"
    assert tx._fold_phase_gates("rz(0.3) q[1];") == "rz(0.3) q[1];"


def test_lifecycle_find_start_remove(qos):
    dev = Device("9gmon", Provider.from_name("tencent"))
    t = tx.submit_task(dev, circuit=bell(), shots=32)
    found = tx.list_tasks(dev)
    assert t.id_ in [f.id_ for f in found]
    assert all(f.device.name == "9gmon" for f in found)
    t2 = tx.resubmit_task(t)
    assert t2.id_ != t.id_
    tx.remove_task(t)
    assert tx.list_tasks(dev) and t.id_ not in [f.id_ for f in tx.list_tasks(dev)]


def test_prettified_details(qos):
    from datetime import datetime

    dev = Device("9gmon", Provider.from_name("tencent"))
    t = tx.submit_task(dev, circuit=bell(), shots=32)
    det = tx.get_task_details(t, prettify=True)
    assert isinstance(det["at"], datetime)
    assert isinstance(det["ts"]["completed"], datetime)
    # frontend circuit reconstructed from the submitted OpenQASM
    assert det["frontend"]._nqubits == 2
    psi_sub = np.asarray(det["frontend"].state())
    psi_ref = np.asarray(bell().state())
    assert abs(abs(np.vdot(psi_sub, psi_ref)) - 1.0) < 1e-6
    assert det["optimization"]["pairs"] == {0: 0, 1: 1}
