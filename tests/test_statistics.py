"""Statistical property tests over repeated measurement / sampling.

Reference model: the repetition-statistics tests in
``tests/test_circuit.py:66-93`` (Bell-pair measurement over hundreds of
repetitions) and the sampling-distribution checks spread through the
reference suite.  These are *distributional* guarantees, checked with
explicit statistical tolerances (4-5 sigma), batched through vmap/status
tensors instead of python loops wherever possible.
"""

import numpy as np
import jax
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc


def bell():
    c = tc.Circuit(2)
    c.h(0)
    c.cnot(0, 1)
    return c


def test_bell_measure_statistics():
    # correlated outcomes only, measure API path (small python loop)
    for _ in range(60):
        c = bell()
        s, p = c.measure_reference(0, 1, with_prob=True)
        assert s in ("00", "11")
        assert abs(float(np.real(p)) - 0.5) < 1e-6
    # frequency balance via the batched jitted sampler
    c = bell()
    key = jax.random.PRNGKey(0)
    samples = np.asarray(c.sample(batch=2048, random_generator=key, format="sample_int"))
    assert set(np.unique(samples)) <= {0, 3}
    frac = float(np.mean(samples == 0))
    # binomial 4-sigma band around 1/2 at 2048 shots
    assert abs(frac - 0.5) < 4 * 0.5 / np.sqrt(2048)


def test_sampler_chi_square_vs_exact():
    """Sampled bitstring histogram on a random 5q circuit must pass a
    chi-square goodness-of-fit test against the exact distribution."""
    n, shots = 5, 8192
    rng = np.random.default_rng(11)
    c = tc.Circuit(n)
    for i in range(n):
        c.ry(i, theta=float(rng.normal()))
    for i in range(n - 1):
        c.cnot(i, i + 1)
    for i in range(n):
        c.rz(i, theta=float(rng.normal()))
        c.rx(i, theta=float(rng.normal() * 0.5))
    p_exact = np.asarray(jnp.real(c.probability())).reshape(-1)
    p_exact = p_exact / p_exact.sum()
    samples = np.asarray(
        c.sample(batch=shots, random_generator=jax.random.PRNGKey(7),
                 format="sample_int")
    )
    counts = np.bincount(samples, minlength=2**n).astype(float)
    # merge tiny-expectation bins (classic chi-square validity rule)
    keep = p_exact * shots >= 5
    obs = np.concatenate([counts[keep], [counts[~keep].sum()]])
    exp = np.concatenate([p_exact[keep] * shots, [p_exact[~keep].sum() * shots]])
    chi2 = float(np.sum((obs - exp) ** 2 / np.maximum(exp, 1e-12)))
    dof = len(obs) - 1
    # chi2 mean = dof, sd = sqrt(2 dof); 5-sigma upper bound
    assert chi2 < dof + 5 * np.sqrt(2 * dof), (chi2, dof)


def test_mid_measure_collapse_frequency():
    """vmapped status-driven mid-circuit measurement: outcome frequency
    matches the pre-measurement marginal, and the post-measurement state
    is correctly collapsed in every trajectory."""
    n, batch = 4, 1024
    theta = 0.9

    def traj(status):
        c = tc.Circuit(n)
        c.ry(0, theta=theta)
        c.cnot(0, 1)
        r = c.cond_measure(1, status=status)
        # conditioned expectation on the twin qubit: must equal the outcome
        z0 = jnp.real(c.expectation_ps(z=[0]))
        return r, z0

    keys = jax.random.uniform(jax.random.PRNGKey(3), (batch,))
    rs, z0s = jax.jit(jax.vmap(traj))(keys)
    rs = np.asarray(rs)
    z0s = np.asarray(z0s)
    p1 = float(np.sin(theta / 2) ** 2)
    frac1 = float(np.mean(rs))
    assert abs(frac1 - p1) < 5 * np.sqrt(p1 * (1 - p1) / batch)
    # perfect correlation: qubit 0 collapses with qubit 1
    np.testing.assert_allclose(z0s, 1.0 - 2.0 * rs, atol=1e-5)


def test_shot_noise_variance_scaling():
    """Variance of the sampled <Z> estimator matches (1 - <Z>^2) / shots."""
    theta = 0.8
    c = tc.Circuit(1)
    c.ry(0, theta=theta)
    z_exact = float(np.cos(theta))
    reps, shots = 256, 64
    keys = jax.random.split(jax.random.PRNGKey(5), reps)

    def one(key):
        s = c.sample(batch=shots, random_generator=key, format="sample_int")
        return 1.0 - 2.0 * jnp.mean(s.astype(jnp.float32))

    ests = np.asarray(jax.jit(jax.vmap(one))(keys))
    var_pred = (1 - z_exact**2) / shots
    assert abs(float(np.mean(ests)) - z_exact) < 5 * np.sqrt(var_pred / reps)
    ratio = float(np.var(ests)) / var_pred
    # sample variance of variance: ~ sqrt(2/reps) relative fluctuation
    assert 0.6 < ratio < 1.5, ratio


def test_porter_thomas_moments():
    """Deep random circuits approach the Porter-Thomas distribution:
    mean bitstring probability 1/D and second moment ~ 2/D^2."""
    n, depth = 8, 16
    D = 2**n
    rng = np.random.default_rng(23)
    c = tc.Circuit(n)
    for l in range(depth):
        for i in range(n):
            c.ry(i, theta=float(rng.uniform(0, 2 * np.pi)))
            c.rz(i, theta=float(rng.uniform(0, 2 * np.pi)))
        for i in range(l % 2, n - 1, 2):
            c.cz(i, i + 1)
    p = np.asarray(jnp.real(c.probability())).reshape(-1)
    assert abs(p.sum() - 1.0) < 1e-5
    m2 = float(np.sum(p**2))  # collision probability
    # Porter-Thomas: sum p^2 = 2/(D+1); tolerate 10% (finite depth/size)
    assert abs(m2 - 2 / (D + 1)) < 0.10 * 2 / (D + 1), m2


def test_stale_key_recovery_across_jit_traces():
    """Regression: an implicit random draw inside one jit trace used to
    store a TRACED key in the module-global backend (this jax traces
    constants too); the next jitted sampler then died with
    UnexpectedTracerError at jaxpr finalization.  Found by the benchmark
    sweep (circuit.sample under jit, then MPSCircuit.sample under jit).
    The backend now detects the escaped tracer and reseeds."""
    p = jnp.ones((4,), jnp.float32) * 0.3

    def fc(params):
        c = tc.Circuit(4)
        for i in range(4):
            c.h(i)
            c.rx(i, theta=params[i])
        return c.sample(allow_state=False, batch=1)[0]

    def fm(params):
        c = tc.MPSCircuit(4)
        for i in range(4):
            c.h(i)
            c.rx(i, theta=params[i])
        return c.sample(allow_state=False, batch=1)[0]

    s1 = jax.jit(fc)(p)  # stores a traced key in the global backend
    s2 = jax.jit(fm)(p)  # used to explode; must sample fine
    assert np.asarray(s1[0]).shape == (4,)
    assert np.asarray(s2[0]).shape == (4,)
    # the supported in-trace seeding pattern must keep working and stay
    # deterministic per key
    K = tc.backend

    def g(key, theta):
        K.set_random_state(key)
        c = tc.Circuit(2)
        c.rx(0, theta=theta)
        c.unitary_kraus(
            [np.sqrt(0.5) * np.eye(2), np.sqrt(0.5) * tc.gates._x_matrix], 0
        )
        return jnp.real(c.expectation_ps(z=[0]))

    a = float(jax.jit(g)(jax.random.PRNGKey(3), 0.3))
    b = float(jax.jit(g)(jax.random.PRNGKey(3), 0.3))
    assert a == b
    outs = {round(float(jax.jit(g)(jax.random.PRNGKey(i), 0.3)), 6) for i in range(8)}
    assert len(outs) >= 2  # both kraus branches appear across keys
