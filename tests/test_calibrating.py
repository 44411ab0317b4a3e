"""Channel-physics calibration: decay constants recovered from simulations.

Counterpart of reference ``tests/test_calibrating.py``: repeated
thermal-relaxation / depolarizing applications on DMCircuit must reproduce
the analytic exponential decays (T1 from excited population, T2 from
coherence, uniform decay from depolarizing).  The evolved rho is threaded
forward via ``dminputs`` so the sweep is linear in steps, not quadratic.
"""

import numpy as np
from scipy.optimize import curve_fit

import tensorcircuit_ng_tpu as tc


def _expfit(ts, ys, p0):
    def f(x, a, tau, c):
        return a * np.exp(-x / tau) + c

    popt, _ = curve_fit(f, ts, ys, p0, maxfev=10000)
    return popt


def _decay_sweep(prep, channel, readout, nstep):
    """Apply `channel` repeatedly, reading out after every step (linear)."""
    dmc = tc.DMCircuit(1)
    prep(dmc)
    rho = np.asarray(dmc.densitymatrix())
    ys = [readout(rho)]
    for _ in range(nstep - 1):
        dmc = tc.DMCircuit(1, dminputs=rho)
        channel(dmc)
        rho = np.asarray(dmc.densitymatrix())
        ys.append(readout(rho))
    return np.array(ys)


def test_t1_calibration():
    t1, t2, dt = 300.0, 100.0, 50.0
    nstep = int(4 * t1 / dt)
    pex = _decay_sweep(
        lambda c: c.x(0),
        lambda c: c.thermalrelaxation(
            0, t1=t1, t2=t2, time=dt, method="AUTO", excitedstatepopulation=0.0
        ),
        lambda rho: float(np.real(rho[1, 1])),
        nstep,
    )
    ts = np.arange(nstep) * dt
    a, tau, c = _expfit(ts, pex, [1.0, t1, 0.0])
    np.testing.assert_allclose(tau, t1, rtol=0.05)


def test_t2_calibration():
    t1, t2, dt = 300.0, 100.0, 20.0
    nstep = int(4 * t2 / dt)
    # coherence |rho_01| decays with T2 (readout needs no basis change)
    coh = _decay_sweep(
        lambda c: c.h(0),
        lambda c: c.thermalrelaxation(
            0, t1=t1, t2=t2, time=dt, method="AUTO", excitedstatepopulation=0.0
        ),
        lambda rho: float(np.abs(rho[0, 1])),
        nstep,
    )
    ts = np.arange(nstep) * dt
    a, tau, c = _expfit(ts, coh, [0.5, t2, 0.0])
    np.testing.assert_allclose(tau, t2, rtol=0.05)


def test_depolarizing_calibration():
    p = 0.02
    nstep = 20
    pex = _decay_sweep(
        lambda c: c.x(0),
        lambda c: c.generaldepolarizing(0, p=p, num_qubits=1),
        lambda rho: float(np.real(rho[0, 0])),
        nstep,
    )
    ks = np.arange(nstep)
    # <Z> shrinks by (1-4p) per application
    a, tau, c = _expfit(ks, pex, [-0.5, 10.0, 0.5])
    expected_tau = -1.0 / np.log(1 - 4 * p)
    np.testing.assert_allclose(tau, expected_tau, rtol=0.05)