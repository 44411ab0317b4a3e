"""Regression tests for the round-2 code-review findings (timeevol /
quantum / contractor / noisemodel / shadows)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu import quantum as qu
from tensorcircuit_ng_tpu import timeevol, shadows, noisemodel


def test_measurement_counts_density_matrix_diagonal():
    rho = np.diag([0.5, 0.5, 0.0, 0.0]).astype(np.complex64)
    p = qu.measurement_counts(rho, counts=None)
    np.testing.assert_allclose(np.asarray(p), [0.5, 0.5, 0.0, 0.0], atol=1e-7)
    # statevector input still |psi|^2
    psi = np.array([1.0, 1.0, 0.0, 0.0]) / np.sqrt(2)
    p2 = qu.measurement_counts(psi, counts=None)
    np.testing.assert_allclose(np.asarray(p2), [0.5, 0.5, 0.0, 0.0], atol=1e-7)


def test_estimate_spectral_bounds_finds_both_edges():
    h = np.diag([-10.0, 1.0, 0.3, -2.0])
    emax, emin = timeevol.estimate_spectral_bounds(h)
    assert abs(emax - 1.0) < 1e-6 and abs(emin + 10.0) < 1e-6
    # feeding them to chebyshev no longer divides by zero
    assert emax > emin


def test_estimate_k_and_M_reference_signatures():
    bounds = (5.0, -5.0)
    k = timeevol.estimate_k(0.5, bounds)
    m = timeevol.estimate_M(0.5, bounds, k)
    assert isinstance(k, int) and isinstance(m, int)
    assert m >= k + 30


def test_hamiltonian_evol_imaginary_time_ground_state():
    h = np.diag([-1.0, 0.5, 2.0, 3.0]).astype(np.complex128)
    psi0 = np.ones(4) / 2.0
    out = timeevol.hamiltonian_evol(h, psi0, jnp.asarray([0.0, 20.0]))
    # long imaginary time projects onto the ground state |0>
    np.testing.assert_allclose(np.abs(np.asarray(out[-1])), [1, 0, 0, 0], atol=1e-6)
    # states are normalized at every time
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=1), 1.0, atol=1e-8)
    # the real-time oracle still evolves unitarily
    outr = timeevol.hamiltonian_evol_real(jnp.asarray(0.7), h, jnp.asarray(psi0, dtype=jnp.complex128))
    np.testing.assert_allclose(np.linalg.norm(np.asarray(outr)), 1.0, atol=1e-8)
    assert timeevol.ed_evol is timeevol.hamiltonian_evol


def test_expm_multiply_real_initial_state():
    h = np.diag([1.0, -1.0]).astype(np.complex128)
    out = timeevol.expm_multiply(h, np.array([1.0, 0.0], dtype=np.float32), t=0.5)
    ref = np.exp(-0.5j) * np.array([1.0, 0.0])
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_choose_slices_never_picks_output_indices():
    from tensorcircuit_ng_tpu.core.contractor import (
        EinsumIR,
        choose_slices,
        sliced_contract_ir,
        contract_ir,
    )

    rng = np.random.default_rng(0)
    a = rng.normal(size=(4, 4))
    b = rng.normal(size=(4, 4))
    ir = EinsumIR([(0, 1), (1, 2)], (0, 2), {0: 4, 1: 4, 2: 4}, [a, b])
    sl = choose_slices(ir, target_size=4)
    assert all(i not in (0, 2) for i in sl), sl
    if sl:
        got = sliced_contract_ir(ir, sl)
        np.testing.assert_allclose(np.asarray(got), a @ b, atol=1e-6)
    with pytest.raises(ValueError):
        sliced_contract_ir(ir, [2])


def test_noiseconf_add_noise_appends():
    from tensorcircuit_ng_tpu.ops import channels

    nc = noisemodel.NoiseConf()
    dep = channels.depolarizingchannel(0.01, 0.01, 0.01)
    amp = channels.amplitudedampingchannel(0.05, 0.0)
    nc.add_noise("rx", dep)
    nc.add_noise("rx", amp)
    chans = nc.channels_for({"name": "rx", "index": (0,)})
    assert len(chans) == 2
    # qubit-specific entries survive an "any" registration and stack too
    nc2 = noisemodel.NoiseConf()
    nc2.add_noise("rz", [dep], [[1]])
    nc2.add_noise("rz", amp)
    nc2.add_noise("rz", [amp], [[1]])
    assert len(nc2.channels_for({"name": "rz", "index": (1,)})) == 3
    assert len(nc2.channels_for({"name": "rz", "index": (0,)})) == 1


def test_channel_count_matches_consumption():
    from tensorcircuit_ng_tpu.ops import channels

    nc = noisemodel.NoiseConf()
    dep = channels.depolarizingchannel(0.01, 0.01, 0.01)  # single-qubit channel
    nc.add_noise("cnot", dep)  # broadcasts over both qubits
    c = tc.Circuit(2)
    c.cnot(0, 1)
    n_pub = noisemodel.channel_count(c, nc)
    n_cls = nc.channel_count(c)
    n_mc = noisemodel._mc_channel_count(c, nc)
    assert n_pub == n_cls == n_mc == 2
    # a correctly sized status is accepted end to end
    val = noisemodel.expectation_noisfy(
        c, (tc.gates.z(), [1]), noise_conf=nc, status=jnp.asarray(np.random.default_rng(0).uniform(size=(7, 2)))
    )
    assert np.isfinite(float(val))


def test_renyi_entropy_2_brydges_estimator():
    # Bell pair: S2 of one qubit = log 2; product |00>: S2 = 0
    n, ns, repeat = 2, 300, 16
    rng = np.random.default_rng(7)
    c = tc.Circuit(n)
    c.h(0)
    c.cnot(0, 1)
    snaps = []
    strings = rng.integers(0, 3, size=(ns, n))
    for s in range(ns):
        cc = tc.Circuit(n, inputs=np.asarray(c.state()))
        for q in range(n):
            if strings[s, q] == 0:
                cc.h(q)
            elif strings[s, q] == 1:
                cc.sd(q)
                cc.h(q)
        st = rng.uniform(size=(repeat, n))
        bits = np.asarray(cc.sample(batch=repeat, allow_state=True, format="sample_bin", status=jnp.asarray(st)))
        snaps.append(bits)
    snaps = np.stack(snaps)  # (ns, repeat, n)
    s2_sub = shadows.renyi_entropy_2(snaps, [0])
    assert abs(s2_sub - np.log(2)) < 0.35, s2_sub
    s2_full = shadows.renyi_entropy_2(snaps)
    assert abs(s2_full) < 0.3, s2_full  # pure state: S2 ~= 0
    # keep/trace-out spellings agree
    assert shadows.renyi_entropy_2(snaps, subsystem_to_keep=[0]) == s2_sub
    assert shadows.renyi_entropy_2(snaps, subsystems_to_trace_out=[1]) == s2_sub
