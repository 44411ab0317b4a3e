"""End-to-end cloud-SDK workflow on the local provider (reference
``examples/tianyan_cloud_demo.py`` role, zero network): submit -> counts ->
post-processing -> readout mitigation -> mitigated expectation.

The cloud abstraction (`tc.cloud.apis`) is exercised exactly the way a
hardware user would drive it, but against the in-process `local` provider
so the example is reproducible and offline:

1. ``set_provider("local")`` + ``list_devices`` + ``submit_task`` with a
   GHZ circuit; the returned Task yields shot counts.
2. Counts post-processing: ``results.counts`` marginals, KL divergence to
   the ideal bimodal distribution, expectation from counts.
3. A synthetic readout error is applied to the ideal counts and
   ``ReadoutMit`` (scalable M3-style) inverts it: the mitigated <Z0 Z1>
   recovers the true value to a few sigma.

Self-validating checks: GHZ counts contain only 000/111 up to shot noise
(KL to ideal < 0.01); expectation-from-counts matches the exact simulator
within 4 sigma; the mitigated expectation is closer to truth than the
corrupted one (and within 0.05 absolute).

Reference behavior anchors: ``tensorcircuit/cloud/apis.py``,
``results/counts.py``, ``results/readout_mitigation.py``.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu.cloud import apis
from tensorcircuit_ng_tpu.results import counts as ct
from tensorcircuit_ng_tpu.results.readout_mitigation import ReadoutMit

N, SHOTS = 3, 8192


def ghz():
    c = tc.Circuit(N)
    c.h(0)
    for i in range(N - 1):
        c.cnot(i, i + 1)
    return c


if __name__ == "__main__":
    apis.set_provider("local")
    devs = apis.list_devices()
    print(f"local provider devices: {[str(d) for d in devs]}")

    # [1] submit and fetch counts
    task = apis.submit_task(circuit=ghz(), shots=SHOTS, device=devs[0])
    res = task.results()
    assert sum(res.values()) == SHOTS
    bad_keys = [k for k in res if k not in ("0" * N, "1" * N)]
    kl = ct.kl_divergence(
        {"0" * N: 0.5, "1" * N: 0.5},
        ct.normalized_count(res),
    )
    print(f"[1] GHZ counts: {dict(res)}, stray keys = {bad_keys}, KL to ideal = {kl:.4f}")
    assert not bad_keys and kl < 0.01

    # [2] expectation from counts vs exact
    e_counts = ct.expectation(res, z=[0, 1])
    e_exact = float(jnp.real(ghz().expectation_ps(z=[0, 1])))
    sigma = 1.0 / np.sqrt(SHOTS)
    print(f"[2] <Z0 Z1> from counts = {e_counts:.4f} vs exact {e_exact:.4f} (sigma {sigma:.4f})")
    assert abs(e_counts - e_exact) < 4 * sigma + 1e-6
    # marginal: qubit 0 alone is maximally mixed
    marg = ct.marginal_count(res, [0])
    p0 = marg.get("0", 0) / SHOTS
    assert abs(p0 - 0.5) < 4 * sigma

    # [3] readout-error corruption + mitigation
    rng = np.random.default_rng(0)
    eps01, eps10 = 0.06, 0.03  # P(read 1|0), P(read 0|1)

    def corrupt(res):
        out = {}
        for k, v in res.items():
            for _ in range(int(v)):
                key = "".join(
                    (
                        ("1" if rng.random() < eps01 else "0")
                        if b == "0"
                        else ("0" if rng.random() < eps10 else "1")
                    )
                    for b in k
                )
                out[key] = out.get(key, 0) + 1
        return out

    noisy = corrupt(res)
    e_noisy = ct.expectation(noisy, z=[0, 1])
    # calibration: single-qubit confusion matrices (as M3 would measure)
    single = np.array([[1 - eps01, eps10], [eps01, 1 - eps10]])
    mit = ReadoutMit(execute=None)
    mit.set_local_cals({q: single for q in range(N)})
    e_mit = mit.expectation(noisy, z=[0, 1])
    print(
        f"[3] <Z0 Z1>: true {e_exact:.4f}, corrupted {e_noisy:.4f}, mitigated {float(e_mit):.4f}"
    )
    assert abs(e_noisy - e_exact) > 0.1  # corruption is visible
    assert abs(float(e_mit) - e_exact) < 0.05
    assert abs(float(e_mit) - e_exact) < abs(e_noisy - e_exact)
    print("OK: cloud submit->counts->mitigation pipeline works offline on the local provider")
