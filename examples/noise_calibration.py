"""Calibrating T1/T2 from simulated relaxation + readout-error mitigation.

Reference role: ``examples/noise_calibration.py`` — (1) characterize
readout error with calibration circuits and undo it two ways (matrix
inverse / constrained least squares); (2) inject thermal relaxation with
known (T1, T2), measure the standard decay experiments, and re-extract
the time constants by exponential fits.

The repo's DMCircuit evolves the exact density matrix, so the "measured"
curves are noiseless expectations and the fits must recover the injected
constants to high precision — a closed-loop identity check of the
thermal-relaxation channel's (t1, t2, time) semantics.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from scipy.optimize import curve_fit, minimize

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu.ops import channels as CH

T1_TRUE, T2_TRUE = 180.0, 120.0  # microseconds; t2 < t1 regime
DT = 20.0  # idle-step duration


def idle_population(nsteps, prep_x=False):
    """<1|rho|1> (T1 exp.) or <+|rho|+> coherence (T2 ramsey) after nsteps
    idle periods of DT under the injected thermal relaxation."""
    c = tc.DMCircuit(1)
    if prep_x:
        c.h(0)
    else:
        c.x(0)
    for _ in range(nsteps):
        c.general_kraus(
            CH.thermalrelaxationchannel(T1_TRUE, T2_TRUE, DT, "ByKraus"), 0
        )
    if prep_x:
        c.h(0)  # map |+><+| coherence onto Z
        return float(np.real(np.asarray(c.expectation_ps(z=[0]))))
    return float(np.real(np.asarray(c.expectation_ps(z=[0]))))


def calibrate_t1():
    ts = np.arange(0, 16) * DT
    # Z expectation of the decaying |1>: z(t) = 1 - 2 exp(-t/T1)
    zs = np.array([idle_population(k) for k in range(16)])
    pop1 = (1.0 - zs) / 2.0
    f = lambda t, T1: np.exp(-t / T1)
    (t1_fit,), _ = curve_fit(f, ts, pop1, p0=[100.0])
    return t1_fit


def calibrate_t2():
    ts = np.arange(0, 16) * DT
    zs = np.array([idle_population(k, prep_x=True) for k in range(16)])
    f = lambda t, T2: np.exp(-t / T2)
    (t2_fit,), _ = curve_fit(f, ts, zs, p0=[100.0])
    return t2_fit


# ---- readout error mitigation (two methods) -------------------------------

def readout_cal_matrix(n, readout_error):
    """Columns = measured distributions of each prepared basis state."""
    cal = np.zeros((2**n, 2**n))
    for i in range(2**n):
        c = tc.Circuit(n)
        for k in range(n):
            if (i >> (n - 1 - k)) & 1:
                c.x(k)
        p = np.asarray(
            c.probability_with_readout_error(readout_error)
            if hasattr(c, "probability_with_readout_error")
            else _probs_with_readout(c, readout_error)
        )
        cal[:, i] = p
    return cal


def _probs_with_readout(c, readout_error):
    """Exact readout-corrupted distribution: per-qubit confusion kron."""
    p = np.asarray(jnp.abs(c.state()) ** 2)
    n = int(round(np.log2(p.size)))
    m = np.eye(1)
    for q in range(n):
        p0c, p1c = readout_error[q]
        m = np.kron(m, np.array([[p0c, 1 - p1c], [1 - p0c, p1c]]))
    return m @ p


def main():
    t1_fit = calibrate_t1()
    t2_fit = calibrate_t2()
    print(f"T1: injected {T1_TRUE} -> fit {t1_fit:.2f}")
    print(f"T2: injected {T2_TRUE} -> fit {t2_fit:.2f}")
    assert abs(t1_fit - T1_TRUE) / T1_TRUE < 0.02
    assert abs(t2_fit - T2_TRUE) / T2_TRUE < 0.02

    n = 3
    readout_error = [[0.96, 0.91], [0.95, 0.88], [0.97, 0.9]]
    cal = readout_cal_matrix(n, readout_error)
    # corrupt a GHZ distribution, then mitigate
    c = tc.Circuit(n)
    c.h(0)
    for k in range(n - 1):
        c.cnot(k, k + 1)
    p_true = np.asarray(jnp.abs(c.state()) ** 2)
    p_noisy = _probs_with_readout(c, readout_error)
    p_inv = np.linalg.inv(cal) @ p_noisy
    res = minimize(
        lambda x: np.sum((p_noisy - cal @ x) ** 2),
        np.ones(2**n) / 2**n,
        method="SLSQP",
        bounds=[(0, 1)] * 2**n,
        constraints={"type": "eq", "fun": lambda x: 1 - np.sum(x)},
    )
    p_sq = res.x
    e_noisy = float(np.abs(p_noisy - p_true).max())
    e_inv = float(np.abs(p_inv - p_true).max())
    e_sq = float(np.abs(p_sq - p_true).max())
    print(f"readout |dp|max: noisy {e_noisy:.4f} -> inverse {e_inv:.2e}, "
          f"least-squares {e_sq:.2e}")
    assert e_inv < 1e-8  # exact distributions: inversion is exact
    assert e_sq < 1e-3
    print("OK")


if __name__ == "__main__":
    main()
