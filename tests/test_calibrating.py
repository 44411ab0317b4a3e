"""Channel-physics calibration: decay constants recovered from simulations.

Counterpart of reference ``tests/test_calibrating.py``: repeated
thermal-relaxation / depolarizing applications on DMCircuit must reproduce
the analytic exponential decays (T1 from excited population, T2 from
coherence, uniform decay from depolarizing).
"""

import numpy as np
from scipy.optimize import curve_fit

import tensorcircuit_ng_tpu as tc


def _expfit(ts, ys, p0):
    def f(x, a, tau, c):
        return a * np.exp(-x / tau) + c

    popt, _ = curve_fit(f, ts, ys, p0, maxfev=10000)
    return popt


def test_t1_calibration():
    t1, t2, dt = 300.0, 100.0, 50.0
    nstep = int(4 * t1 / dt)
    pex, ts = [], []
    for i in range(nstep):
        dmc = tc.DMCircuit(1)
        dmc.x(0)
        for _ in range(i):
            dmc.thermalrelaxation(0, t1=t1, t2=t2, time=dt, method="AUTO",
                                  excitedstatepopulation=0.0)
        z = float(np.real(np.asarray(dmc.expectation_ps(z=[0]))))
        pex.append((1 - z) / 2.0)
        ts.append(i * dt)
    a, tau, c = _expfit(np.array(ts), np.array(pex), [1.0, t1, 0.0])
    np.testing.assert_allclose(tau, t1, rtol=0.05)


def test_t2_calibration():
    t1, t2, dt = 300.0, 100.0, 20.0
    nstep = int(4 * t2 / dt)
    pex, ts = [], []
    for i in range(nstep):
        dmc = tc.DMCircuit(1)
        dmc.h(0)
        for _ in range(i):
            dmc.thermalrelaxation(0, t1=t1, t2=t2, time=dt, method="AUTO",
                                  excitedstatepopulation=0.0)
        dmc.h(0)
        z = float(np.real(np.asarray(dmc.expectation_ps(z=[0]))))
        pex.append((1 - z) / 2.0)
        ts.append(i * dt)
    a, tau, c = _expfit(np.array(ts), np.array(pex), [-0.5, t2, 0.5])
    np.testing.assert_allclose(tau, t2, rtol=0.05)


def test_depolarizing_calibration():
    p = 0.02
    pex, ks = [], []
    for i in range(0, 40, 2):
        dmc = tc.DMCircuit(1)
        dmc.x(0)
        for _ in range(i):
            dmc.generaldepolarizing(0, p=p, num_qubits=1)
        z = float(np.real(np.asarray(dmc.expectation_ps(z=[0]))))
        pex.append((1 - z) / 2.0)
        ks.append(i)
    # <Z> shrinks by (1-4p) per application
    a, tau, c = _expfit(np.array(ks), np.array(pex), [0.5, 10.0, 0.5])
    expected_tau = -1.0 / np.log(1 - 4 * p)
    np.testing.assert_allclose(tau, expected_tau, rtol=0.05)
