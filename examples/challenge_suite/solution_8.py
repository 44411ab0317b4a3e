"""Challenge problem 8: 49-qubit shallow 2D circuit sampling.

Spec: reference ``examples/challenge_suite/problem_8.md``. The depth-1
locality makes the rows a 1D causal chain, so sampling is EXACT with a
sliding two-row window (14 qubits, 2^14 amplitudes — never 2^49): finish
row r's gates, sample its 7 bits as ONE categorical draw over the 128 row
outcomes (searchsorted CDF on the row marginal), condition the window, and
slide.  All 8192 samples run as one vmap with externalized uniforms.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import numpy as np
import jax
import jax.numpy as jnp

from tensorcircuit_ng_tpu.core import statevec as sv
from tensorcircuit_ng_tpu.ops import gates as G


def _angles(config):
    side = config["grid_side"]

    def alpha(r, c):
        return (
            config["ry_offset"]
            + config["ry_row_sin_scale"] * np.sin(config["ry_row_sin_frequency"] * (r + 1))
            + config["ry_col_cos_scale"] * np.cos(config["ry_col_cos_frequency"] * (c + 1))
            + config["ry_diag_sin_scale"] * np.sin(config["ry_diag_sin_frequency"] * (r + c + 2))
        )

    def gamma(r, c):
        return (
            config["rx_offset"]
            + config["rx_row_cos_scale"] * np.cos(config["rx_row_cos_frequency"] * (r + 1))
            - config["rx_col_sin_scale"] * np.sin(config["rx_col_sin_frequency"] * (c + 1))
            + config["rx_diag_cos_scale"] * np.cos(config["rx_diag_cos_frequency"] * (r + c + 2))
        )

    # horizontal rzz angles, row-major edge order
    beta_h = {}
    kh = 0
    for r in range(side):
        for c in range(side - 1):
            beta_h[(r, c)] = (
                config["rzz_offset"]
                + config["rzz_edge_sin_scale"] * np.sin(config["rzz_edge_sin_frequency"] * (kh + 1))
                + config["rzz_site_cos_scale"] * np.cos(config["rzz_site_cos_frequency"] * (2 * r + c + 1))
            )
            kh += 1
    beta_v = {}
    kv = 0
    for r in range(side - 1):
        for c in range(side):
            beta_v[(r, c)] = (
                config["rxx_offset"]
                + config["rxx_edge_cos_scale"] * np.cos(config["rxx_edge_cos_frequency"] * (kv + 1))
                + config["rxx_site_sin_scale"] * np.sin(config["rxx_site_sin_frequency"] * (r + 2 * c + 1))
            )
            kv += 1
    return alpha, gamma, beta_h, beta_v


def run_solution(config):
    side = config["grid_side"]
    n = config["n_qubits"]
    nsamp = config["n_samples"]
    alpha, gamma, beta_h, beta_v = _angles(config)

    w = 2 * side  # window qubits: row r -> slots 0..6, row r+1 -> slots 7..13
    dimrow = 2**side

    # numpy gate constants (all angles fixed -> free jit lifting)
    def ry(t):
        return np.asarray(G.ry_matrix(float(t), dtype="complex64"))

    def rx(t):
        return np.asarray(G.rx_matrix(float(t), dtype="complex64"))

    def rzz(t):
        return np.asarray(G.rzz_matrix(float(t), dtype="complex64"))

    def rxx(t):
        return np.asarray(G.rxx_matrix(float(t), dtype="complex64"))

    def prep_row(psi, row, base):
        """ry + intra-row rzz on window slots [base, base+side) for grid row."""
        for c in range(side):
            psi = sv.apply_unitary(psi, ry(alpha(row, c)), [base + c])
        for c in range(side - 1):
            psi = sv.apply_unitary(psi, rzz(beta_h[(row, c)]), [base + c, base + c + 1])
        return psi

    def couple_rows(psi, row):
        """vertical rxx between slots c (row) and side+c (row+1)."""
        for c in range(side):
            psi = sv.apply_unitary(psi, rxx(beta_v[(row, c)]), [c, side + c])
        return psi

    def finish_row(psi, row):
        for c in range(side):
            psi = sv.apply_unitary(psi, rx(gamma(row, c)), [c])
        return psi

    eps = 0.31415926e-12

    def sample_one(status):
        # window starts as rows (0, 1)
        psi = sv.init_state(w)
        psi = prep_row(psi, 0, 0)
        psi = prep_row(psi, 1, side)
        psi = couple_rows(psi, 0)
        psi = finish_row(psi, 0)
        bits_all = []
        for r in range(side):
            m = jnp.reshape(psi, (dimrow, dimrow))
            p = jnp.sum(jnp.abs(m) ** 2, axis=1)
            p = p / jnp.sum(p)
            cdf = jnp.cumsum(p)
            b = jnp.searchsorted(cdf, status[r] - eps)
            b = jnp.clip(b, 0, dimrow - 1)
            bits_all.append(b)
            if r < side - 1:
                cond = jnp.take(m, b, axis=0)
                cond = cond / jnp.linalg.norm(cond)
                if r < side - 2:
                    # new window: (row r+1 conditioned, fresh row r+2)
                    fresh = sv.init_state(side)
                    psi = jnp.reshape(jnp.outer(cond, fresh), (-1,))
                    psi = prep_row(psi, r + 2, side)
                    psi = couple_rows(psi, r + 1)
                    psi = finish_row(psi, r + 1)
                else:
                    # last row: only its rx layer remains; keep the window
                    # shape constant by tensoring a dummy |0>^side register
                    psi7 = cond
                    for c in range(side):
                        psi7 = sv.apply_unitary(psi7, rx(gamma(side - 1, c)), [c])
                    psi = jnp.reshape(jnp.outer(psi7, sv.init_state(side)), (-1,))
        return jnp.stack(bits_all)

    status = np.random.default_rng(20260816).uniform(size=(nsamp, side)).astype(np.float32)
    run = jax.jit(jax.vmap(sample_one))
    rows = np.asarray(run(jnp.asarray(status)))  # (nsamp, side) row ints

    # unpack row ints to bits, row-major
    bits = np.zeros((nsamp, n), dtype=np.int64)
    for r in range(side):
        for c in range(side):
            bits[:, side * r + c] = (rows[:, r] >> (side - 1 - c)) & 1
    return {"samples": bits}


if __name__ == "__main__":
    import time

    config = {
        "grid_side": 7,
        "n_qubits": 49,
        "n_samples": 8192,
        "ry_offset": 0.19, "ry_row_sin_scale": 0.07, "ry_row_sin_frequency": 0.83,
        "ry_col_cos_scale": 0.05, "ry_col_cos_frequency": 0.61,
        "ry_diag_sin_scale": 0.03, "ry_diag_sin_frequency": 0.29,
        "rzz_offset": 0.31, "rzz_edge_sin_scale": 0.09, "rzz_edge_sin_frequency": 0.47,
        "rzz_site_cos_scale": 0.06, "rzz_site_cos_frequency": 0.38,
        "rxx_offset": 0.27, "rxx_edge_cos_scale": 0.08, "rxx_edge_cos_frequency": 0.41,
        "rxx_site_sin_scale": 0.07, "rxx_site_sin_frequency": 0.33,
        "rx_offset": 0.17, "rx_row_cos_scale": 0.06, "rx_row_cos_frequency": 0.52,
        "rx_col_sin_scale": 0.04, "rx_col_sin_frequency": 0.44,
        "rx_diag_cos_scale": 0.02, "rx_diag_cos_frequency": 0.25,
    }
    t0 = time.time()
    res = run_solution(config)
    dt = time.time() - t0
    s = res["samples"]
    print(f"problem 8: {dt:.2f}s for {s.shape} samples; mean bit {s.mean():.4f}")
    assert s.shape == (8192, 49) and set(np.unique(s)) <= {0, 1}
