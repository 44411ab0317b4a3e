"""Fourier-series structure of a data re-uploading PQC.

Reference role: ``examples/fourier_reuploading.py`` — Schuld et al.,
"The effect of data encoding on the expressive power of variational
quantum-classical algorithms", PRA 103, 032430 (2021).

Single-qubit re-uploading circuit, L layers of  Ry(θ_l)·Rz(φ_l)·Rz(x),
readout <X>.  The theorem: f(x) = <X>(x) is a trigonometric polynomial of
degree L — frequencies limited to integers {-L..L} no matter how the
trainable angles are set.

Two independent demonstrations, cross-checked:
1. symbolic — :class:`SymbolCircuit` keeps x as a sympy symbol; expanding
   the exact <X>(x) expression in exp(i k x) reads the Fourier
   coefficients off analytically;
2. numeric — an FFT of the jitted circuit evaluated on a uniform x grid
   must reproduce the same coefficients AND show exactly zero weight
   above frequency L.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import sympy as sp
import jax

# exact-oracle validation example: run on host CPU (see CLAUDE.md)
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc

L = 3
rng = np.random.default_rng(11)
thetas = rng.uniform(0, 2 * np.pi, size=L)
phis = rng.uniform(0, 2 * np.pi, size=L)


def build_symbolic():
    x = sp.Symbol("x", real=True)
    c = tc.SymbolCircuit(1)
    for l in range(L):
        c.ry(0, theta=float(thetas[l]))
        c.rz(0, theta=float(phis[l]))
        c.rz(0, theta=x)  # data encoding
    return c, x


def fourier_coeffs_symbolic(c, x, L):
    """Exact Fourier coefficients c_k of <X>(x) via rewrite to exp(i k x)."""
    fx = c.expectation_ps(x=[0])
    fx = sp.expand(sp.simplify(fx.rewrite(sp.exp)))
    coeffs = {}
    for k in range(-L, L + 1):
        # c_k = (1/2pi) ∫ f e^{-ikx}: project by orthogonality on the
        # expanded exponential-polynomial form
        ck = fx.coeff(sp.exp(sp.I * x), k) if k != 0 else None
        if k == 0:
            rest = fx
            for kk in range(-L, L + 1):
                if kk:
                    rest = rest - fx.coeff(sp.exp(sp.I * x), kk) * sp.exp(
                        sp.I * kk * x
                    )
            ck = sp.simplify(rest)
        coeffs[k] = complex(sp.N(ck))
    return coeffs


def f_numeric():
    def f(x):
        c = tc.Circuit(1)
        for l in range(L):
            c.ry(0, theta=thetas[l])
            c.rz(0, theta=phis[l])
            c.rz(0, theta=x)
        return jnp.real(c.expectation_ps(x=[0]))

    return jax.jit(jax.vmap(f))


def main():
    csym, x = build_symbolic()
    coeffs = fourier_coeffs_symbolic(csym, x, L)

    # numeric FFT on 2L+1+pad points
    N = 64
    xs = jnp.asarray(np.linspace(0, 2 * np.pi, N, endpoint=False), jnp.float32)
    ys = np.asarray(f_numeric()(xs), dtype=np.float64)
    fft = np.fft.fft(ys) / N  # c_k at index k (mod N)

    print(f"L={L} re-uploading layers -> degree-{L} trigonometric polynomial")
    max_err = 0.0
    for k in range(-L, L + 1):
        ck_num = fft[k % N]
        ck_sym = coeffs[k]
        max_err = max(max_err, abs(ck_num - ck_sym))
        print(f"  c_{k:+d}: symbolic {ck_sym:+.6f}  fft {ck_num:+.6f}")
    # spectral cutoff: NO weight above frequency L
    tail = max(abs(fft[k]) for k in range(L + 1, N - L))
    print(f"symbolic-vs-fft max err {max_err:.2e}; spectral tail above L: {tail:.2e}")
    assert max_err < 1e-6
    assert tail < 1e-7, tail  # the Schuld degree bound, numerically exact
    # hermiticity of the series: c_{-k} = conj(c_k)
    for k in range(1, L + 1):
        assert abs(coeffs[k] - np.conj(coeffs[-k])) < 1e-9
    print("OK")


if __name__ == "__main__":
    main()
