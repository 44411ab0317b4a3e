"""Classical Ising partition functions as hyperedge tensor networks.

Reference examples hyperedge_partitionfunction.py role: Z = sum_s prod_bonds
exp(beta J s_i s_j) is an einsum where each SPIN is one index shared by all
of its bond tensors — a hyperedge of degree = coordination number.  The
einsum IR supports hyperedges natively (no COPY-tensor expansion), and the
path planner + contractor evaluate it like any circuit network.

Self-validating:
- 4x4 periodic square lattice: contractor Z == brute-force 2^16 enumeration
  at several temperatures;
- 10x10: ln Z per site vs the exact 2^10 transfer-matrix value;
- AD: d(ln Z)/d(beta) = mean bond energy, checked against the transfer
  matrix via finite differences.
"""

import itertools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from tensorcircuit_ng_tpu.core.contractor import EinsumIR, contract_ir


def square_bonds(lx, ly, pbc=True):
    bonds = []
    for x in range(lx):
        for y in range(ly):
            i = x * ly + y
            if pbc or x + 1 < lx:
                bonds.append((i, ((x + 1) % lx) * ly + y))
            if pbc or y + 1 < ly:
                bonds.append((i, x * ly + (y + 1) % ly))
    return bonds


def ising_ir(bonds, nspins, beta, j=1.0):
    """One rank-2 Boltzmann tensor per bond; spins are shared indices."""
    b = np.exp(beta * j * np.array([[1.0, -1.0], [-1.0, 1.0]]))
    inputs = [tuple(bond) for bond in bonds]
    sizes = {i: 2 for i in range(nspins)}
    tensors = [b for _ in bonds]
    return EinsumIR(inputs, (), sizes, tensors)


def z_contract(bonds, nspins, beta):
    return float(np.real(np.asarray(contract_ir(ising_ir(bonds, nspins, beta)))))


def z_brute(bonds, nspins, beta):
    z = 0.0
    for cfg in itertools.product((1, -1), repeat=nspins):
        e = sum(cfg[a] * cfg[b] for a, b in bonds)
        z += np.exp(beta * e)
    return z


def lnz_transfer(lx, ly, beta):
    """ln Z of the periodic lx x ly lattice via the 2^ly transfer matrix."""
    dim = 2**ly
    spins = np.array(
        [[1 - 2 * ((c >> k) & 1) for k in range(ly)] for c in range(dim)]
    )
    intra = np.array(
        [beta * sum(s[k] * s[(k + 1) % ly] for k in range(ly)) for s in spins]
    )
    inter = beta * (spins @ spins.T)
    t = np.exp(0.5 * intra[:, None] + inter + 0.5 * intra[None, :])
    w = np.linalg.eigvalsh(t)
    # Z = tr(T^lx); use the full spectrum (exact at these sizes)
    return float(np.log(np.sum(w**lx)))


def main():
    # --- 4x4 vs brute force -------------------------------------------------
    lx = ly = 4
    bonds = square_bonds(lx, ly)
    for beta in (0.2, 0.44, 0.8):
        zc = z_contract(bonds, lx * ly, beta)
        zb = z_brute(bonds, lx * ly, beta)
        print(f"4x4 beta={beta}: contractor {zc:.6e} brute {zb:.6e}")
        assert abs(zc / zb - 1) < 1e-4

    # --- 10x10 vs transfer matrix (2^100 states, 2^10 transfer) ------------
    lx = ly = 10
    bonds = square_bonds(lx, ly)
    beta = 0.4
    # float64 for the wide dynamic range of Z at 200 bonds
    import tensorcircuit_ng_tpu as tc

    tc.set_dtype("complex128")
    try:
        lnz = np.log(z_contract(bonds, lx * ly, beta))
        lnz_tm = lnz_transfer(lx, ly, beta)
        print(f"10x10 beta={beta}: lnZ/site {lnz/100:.8f} vs transfer "
              f"{lnz_tm/100:.8f}")
        assert abs(lnz - lnz_tm) < 1e-5 * abs(lnz_tm)

        # --- AD through the contraction: mean bond energy -------------------
        def lnz_of(beta_t):
            bmat = jnp.exp(
                beta_t * jnp.asarray([[1.0, -1.0], [-1.0, 1.0]], jnp.float64)
            ).astype(jnp.complex128)
            ir = ising_ir(bonds, lx * ly, 0.0)
            ir = EinsumIR(ir.inputs, ir.output, ir.size_dict, [bmat] * len(bonds))
            return jnp.real(jnp.log(contract_ir(ir)))

        e_mean = float(jax.grad(lnz_of)(jnp.float64(beta)))
        db = 1e-5
        e_fd = (lnz_transfer(lx, ly, beta + db) - lnz_transfer(lx, ly, beta - db)) / (
            2 * db
        )
        print(f"d lnZ/d beta: AD {e_mean:.6f} vs transfer FD {e_fd:.6f}")
        assert abs(e_mean - e_fd) < 1e-3 * abs(e_fd)
    finally:
        tc.set_dtype("complex64")
    print("OK")


if __name__ == "__main__":
    main()
