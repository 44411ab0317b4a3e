"""Time evolution engines + experimental utilities + interfaces tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu import quantum as qu
from tensorcircuit_ng_tpu import timeevol, experimental


def tfim_dense(n, j=1.0, h=1.0):
    ls, ws = [], []
    for i in range(n - 1):
        l = [0] * n
        l[i] = 3
        l[i + 1] = 3
        ls.append(l)
        ws.append(j)
    for i in range(n):
        l = [0] * n
        l[i] = 1
        ls.append(l)
        ws.append(h)
    return qu.PauliStringSum2Dense(ls, ws), (ls, ws)


@pytest.mark.slow  # krylov covered by the chebyshev/krylov example; sparse sibling in CI
def test_krylov_vs_exact(highp):
    n = 5
    h, _ = tfim_dense(n)
    h = jnp.asarray(np.asarray(h), dtype=jnp.complex128)
    psi0 = np.zeros(2**n)
    psi0[0] = 1.0
    psi0 = jnp.asarray(psi0, dtype=jnp.complex128)
    ts = jnp.asarray([0.2, 0.5, 1.0])
    exact = timeevol.hamiltonian_evol_real(ts, h, psi0)
    kry = timeevol.krylov_evol(h, psi0, ts, subspace_dimension=20)
    np.testing.assert_allclose(np.asarray(kry), np.asarray(exact), atol=1e-6)


@pytest.mark.slow  # test_krylov_vs_exact covers the krylov surface in the fast gate
def test_krylov_sparse_and_mvp(highp):
    n = 4
    hd, (ls, ws) = tfim_dense(n)
    hd = jnp.asarray(np.asarray(hd), dtype=jnp.complex128)
    hs = qu.PauliStringSum2COO(ls, ws)
    mvp = qu.PauliStringSum2MVP(ls, ws)
    psi0 = jnp.asarray(np.random.default_rng(0).normal(size=2**n), dtype=jnp.complex128)
    psi0 = psi0 / jnp.linalg.norm(psi0)
    ts = jnp.asarray([0.7])
    ref = timeevol.krylov_evol(hd, psi0, ts, 16)
    for hh in [hs, mvp]:
        out = timeevol.krylov_evol(hh, psi0, ts, 16)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_chebyshev_evol(highp):
    n = 4
    h, _ = tfim_dense(n)
    h = jnp.asarray(np.asarray(h), dtype=jnp.complex128)
    psi0 = np.zeros(2**n)
    psi0[0] = 1.0
    psi0 = jnp.asarray(psi0, dtype=jnp.complex128)
    t = 0.8
    exact = timeevol.hamiltonian_evol_real(jnp.asarray(t), h, psi0)
    e = np.linalg.eigvalsh(np.asarray(h))
    out = timeevol.chebyshev_evol(h, psi0, t, (float(e[-1]) + 0.1, float(e[0]) - 0.1))
    np.testing.assert_allclose(np.asarray(out), np.asarray(exact), atol=1e-6)
    # norm deviation as accuracy check stays ~1
    np.testing.assert_allclose(float(jnp.linalg.norm(out)), 1.0, atol=1e-6)


def test_expm_multiply(highp):
    n = 4
    h, _ = tfim_dense(n)
    h = jnp.asarray(np.asarray(h), dtype=jnp.complex128)
    psi0 = np.zeros(2**n)
    psi0[0] = 1.0
    psi0 = jnp.asarray(psi0, dtype=jnp.complex128)
    exact = timeevol.hamiltonian_evol_real(jnp.asarray(0.5), h, psi0)
    out = timeevol.expm_multiply(h, psi0, t=0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(exact), atol=1e-8)


def test_ode_evol_global(highp):
    n = 3
    h, _ = tfim_dense(n)
    h = jnp.asarray(np.asarray(h), dtype=jnp.complex128)
    psi0 = np.zeros(2**n)
    psi0[0] = 1.0
    psi0 = jnp.asarray(psi0, dtype=jnp.complex128)
    ts = jnp.asarray([0.3, 0.6])
    exact = timeevol.hamiltonian_evol_real(ts, h, psi0)
    out = timeevol.ode_evol_global(lambda t: h, psi0, ts)
    np.testing.assert_allclose(np.asarray(out), np.asarray(exact), atol=1e-5)


def test_ode_evol_local(highp):
    # single-qubit rotation on qubit 1 of 3: compare with circuit rx
    n = 3
    x = jnp.asarray(np.array([[0.0, 1.0], [1.0, 0.0]]), dtype=jnp.complex128)
    psi0 = np.zeros(2**n)
    psi0[0] = 1.0
    psi0 = jnp.asarray(psi0, dtype=jnp.complex128)
    theta = 0.9
    out = timeevol.ode_evol_local(lambda t: 0.5 * x, psi0, jnp.asarray([theta]), [1])
    c = tc.Circuit(n)
    c.rx(1, theta=theta)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(c.state()), atol=1e-5)


def test_adaptive_vmap():
    def f(x):
        return jnp.sum(x**2)

    xs = jnp.asarray(np.random.default_rng(0).normal(size=(13, 4)), dtype=jnp.float32)
    out = experimental.adaptive_vmap(f, chunk_size=5)(xs)
    np.testing.assert_allclose(np.asarray(out), np.sum(np.asarray(xs) ** 2, axis=1), atol=1e-5)


def test_parameter_shift_vs_ad():
    n = 2  # tracing-dominated (2 shifted circuits per param); n=2 covers the rule

    def loss(params):
        c = tc.Circuit(n)
        for i in range(n):
            c.rx(i, theta=params[i])
        c.cnot(0, 1)
        return jnp.real(c.expectation_ps(z=[1]))

    params = jnp.asarray([0.3, 0.8], dtype=jnp.float32)
    g_ad = jax.grad(loss)(params)
    g_ps = experimental.parameter_shift_grad(loss)(params)
    np.testing.assert_allclose(np.asarray(g_ps), np.asarray(g_ad), atol=1e-4)


@pytest.mark.slow  # QNG niche surface; experimental.qng covered by its own slow sweep
def test_qng_single_qubit():
    # |psi> = rx(theta)|0>: QFIM = 1 (with the 4x convention)
    def state(theta):
        c = tc.Circuit(1)
        c.rx(0, theta=theta[0])
        return c.state()

    qfim = experimental.qng(state)(jnp.asarray([0.7], dtype=jnp.float32))
    np.testing.assert_allclose(np.asarray(qfim), [[1.0]], atol=1e-5)


@pytest.mark.slow  # scan-layers semantics exercised by the depth-scaling examples; CI retains
def test_scan_circuit_layers():
    n = 5
    nlayers = 3
    params = jnp.asarray(
        np.random.default_rng(0).normal(size=(nlayers, 2, n)) * 0.3, dtype=jnp.float32
    )

    def layer(c, p):
        for i in range(n - 1):
            c.rzz(i, i + 1, theta=p[0, i])
        for i in range(n):
            c.rx(i, theta=p[1, i])

    c0 = tc.Circuit(n)
    for i in range(n):
        c0.h(i)
    c_scan = experimental.scan_circuit_layers(c0, layer, params)

    c_ref = tc.Circuit(n)
    for i in range(n):
        c_ref.h(i)
    for l in range(nlayers):
        layer(c_ref, params[l])
    np.testing.assert_allclose(np.asarray(c_scan.state()), np.asarray(c_ref.state()), atol=1e-5)
    # also grad through scan
    def loss(ps):
        cc = experimental.scan_circuit_layers(c0, layer, ps)
        return jnp.real(cc.expectation_ps(z=[0]))

    g = jax.jit(jax.grad(loss))(params)
    assert np.isfinite(np.asarray(g)).all()


def test_scipy_interface():
    from scipy.optimize import minimize

    n = 3

    def loss(params):
        c = tc.Circuit(n)
        for i in range(n):
            c.rx(i, theta=params[i])
        return jnp.real(c.expectation_ps(z=[0]))

    f = tc.interfaces.scipy_optimize_interface(loss, shape=(n,))
    res = minimize(f, np.zeros(n) + 0.3, jac=True, method="L-BFGS-B")
    np.testing.assert_allclose(res.fun, -1.0, atol=1e-4)


def test_numpy_interface():
    def loss(x):
        return jnp.sum(x**2)

    f = tc.interfaces.numpy_interface(loss, jit=True)
    out = f(np.asarray([1.0, 2.0], dtype=np.float32))
    np.testing.assert_allclose(out, 5.0, atol=1e-6)


def test_torch_interface():
    torch = pytest.importorskip("torch")
    n = 2

    def loss(params):
        c = tc.Circuit(n)
        c.rx(0, theta=params[0])
        c.rx(1, theta=params[1])
        c.cnot(0, 1)
        return jnp.real(c.expectation_ps(z=[1]))

    f = tc.interfaces.torch_interface(loss)
    x = torch.tensor([0.4, 0.8], requires_grad=True)
    y = f(x)
    y.backward()
    g_torch = x.grad.detach().numpy()
    g_jax = np.asarray(jax.grad(loss)(jnp.asarray([0.4, 0.8], dtype=jnp.float32)))
    np.testing.assert_allclose(g_torch, g_jax, atol=1e-5)


def test_jax_export_save_load(tmp_path):
    def f(x):
        return jnp.sum(jnp.sin(x))

    path = str(tmp_path / "f.bin")
    x = jnp.asarray([0.1, 0.2], dtype=jnp.float32)
    experimental.jax_jitted_function_save(path, f, x)
    g = experimental.jax_jitted_function_load(path)
    np.testing.assert_allclose(np.asarray(g(x)), np.asarray(f(x)), atol=1e-6)


@pytest.mark.slow  # heavy; fast sibling covers the path
def test_traced_time_chebyshev_and_bessel():
    """Differentiable evolution TIME: traced Bessel coefficients (custom JVP)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from scipy.special import jv

    from tensorcircuit_ng_tpu import timeevol as te
    from tensorcircuit_ng_tpu import quantum as qu

    f = te.bessel_jn_traced(16)
    for x in (0.0, 0.4, 3.3, 12.0):
        np.testing.assert_allclose(
            np.asarray(f(jnp.asarray(x, jnp.float32))), jv(np.arange(17), x), atol=1e-4
        )
    g = jax.jacfwd(f)(jnp.asarray(1.3, jnp.float32))
    exact = 0.5 * (jv(np.arange(-1, 16), 1.3) - jv(np.arange(1, 18), 1.3))
    np.testing.assert_allclose(np.asarray(g), exact, atol=1e-5)

    n = 4
    ls, ws = [], []
    for i in range(n - 1):
        l = [0] * n
        l[i] = 3
        l[i + 1] = 3
        ls.append(l)
        ws.append(1.0)
    for i in range(n):
        l = [0] * n
        l[i] = 1
        ls.append(l)
        ws.append(-1.0)
    h = qu.PauliStringSum2Dense(ls, ws, numpy=True)
    ev, evec = np.linalg.eigh(h)
    psi0 = np.zeros(2**n, dtype=np.complex64)
    psi0[0] = 1.0
    bounds = (float(ev[-1]) + 0.1, float(ev[0]) - 0.1)
    t0 = 0.7
    exact = evec @ np.diag(np.exp(-1j * ev * t0)) @ evec.conj().T @ psi0
    val = te.chebyshev_evol(
        h.astype(np.complex64), jnp.asarray(psi0), jnp.asarray(t0), bounds, M=24
    )
    assert float(np.linalg.norm(np.asarray(val) - exact)) < 1e-4

    def fidelity(t):
        psi_t = te.chebyshev_evol(
            h.astype(np.complex64), jnp.asarray(psi0), t, bounds, M=24
        )
        return jnp.abs(jnp.vdot(jnp.asarray(psi0), psi_t)) ** 2

    gv = float(jax.grad(fidelity)(jnp.asarray(t0, jnp.float32)))
    fdv = (
        float(fidelity(jnp.asarray(t0 + 1e-3))) - float(fidelity(jnp.asarray(t0 - 1e-3)))
    ) / 2e-3
    assert abs(gv - fdv) < 1e-2


def test_vvag_and_adaptive_vmap_edges():
    import numpy as np
    import jax
    import jax.numpy as jnp

    import tensorcircuit_ng_tpu as tc
    from tensorcircuit_ng_tpu.backend import backend as K
    from tensorcircuit_ng_tpu import experimental

    n = 4

    def f(weights, inputs):
        c = tc.Circuit(n)
        for i in range(n):
            c.rx(i, theta=inputs[i])
        for i in range(n):
            c.ry(i, theta=weights[i])
        return jnp.real(c.expectation_ps(z=[0]))

    vvag = K.vectorized_value_and_grad(f, argnums=0, vectorized_argnums=1)
    w = jnp.asarray(np.random.default_rng(0).normal(size=n) * 0.3, jnp.float32)
    xs = jnp.asarray(np.random.default_rng(1).normal(size=(3, n)) * 0.3, jnp.float32)
    vals, grads = vvag(w, xs)
    assert vals.shape == (3,)
    # reference loop: grads must be the SUM over the batch (reference vvag
    # contract for shared weights); jitted once so the loop reuses the trace
    gf = jax.jit(jax.value_and_grad(f, argnums=0))
    refs = [gf(w, xs[b]) for b in range(3)]
    g_sum = sum(g for _, g in refs)
    np.testing.assert_allclose(np.asarray(grads), np.asarray(g_sum), atol=1e-5)
    for b in range(3):
        np.testing.assert_allclose(float(vals[b]), float(refs[b][0]), atol=1e-6)

    # adaptive_vmap: batch (7) not divisible by chunk (3)
    av = experimental.adaptive_vmap(lambda x: jnp.sum(x**2, axis=-1) if False else jnp.sum(x**2), vectorized_argnums=0, chunk_size=3)
    xs7 = jnp.asarray(np.arange(21.0).reshape(7, 3), jnp.float32)
    out = av(xs7)
    np.testing.assert_allclose(np.asarray(out), np.sum(np.asarray(xs7)**2, axis=1), atol=1e-5)
