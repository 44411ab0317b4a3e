"""Variational ansatz generators (reference ``templates/ansatz.py``)."""

from __future__ import annotations

from typing import Any, Optional, Sequence

import numpy as np

__all__ = ["QAOA_ansatz_for_Ising", "hea_ansatz"]


def QAOA_ansatz_for_Ising(
    params: Any,
    nlayers: int,
    pauli_terms: Sequence[Sequence[int]],
    weights: Sequence[float],
    full_coupling: bool = False,
    mixer: str = "X",
) -> Any:
    """Build the QAOA circuit for an Ising-type objective.

    ``params``: [2 * nlayers] (gamma, beta interleaved); ``pauli_terms``:
    0/3 structures (reference ``ansatz.py:QAOA_ansatz_for_Ising``).
    """
    import jax.numpy as jnp

    from ..models.circuit import Circuit

    n = len(pauli_terms[0])
    params = jnp.reshape(jnp.asarray(params), (-1,))
    c = Circuit(n)
    for i in range(n):
        c.h(i)
    for l in range(nlayers):
        gamma = params[2 * l]
        beta = params[2 * l + 1]
        for term, w in zip(pauli_terms, weights):
            sites = [i for i, v in enumerate(term) if v == 3]
            if len(sites) == 1:
                c.rz(sites[0], theta=2.0 * gamma * w)
            elif len(sites) == 2:
                c.rzz(sites[0], sites[1], theta=2.0 * gamma * w)
            elif len(sites) > 2:
                # general multi-Z string via exp1 of diagonal generator
                zdiag = np.ones(2 ** len(sites))
                for k in range(2 ** len(sites)):
                    par = bin(k).count("1") % 2
                    zdiag[k] = 1.0 if par == 0 else -1.0
                c.exp1(*sites, theta=gamma * w, unitary=np.diag(zdiag))
        for i in range(n):
            if mixer == "X":
                c.rx(i, theta=2.0 * beta)
            elif mixer == "XY":
                if i < n - 1:
                    c.rxx(i, i + 1, theta=2.0 * beta)
                    c.ryy(i, i + 1, theta=2.0 * beta)
            elif mixer == "ZZ":
                if i < n - 1:
                    c.rzz(i, i + 1, theta=2.0 * beta)
    return c


def hea_ansatz(params: Any, n: int, nlayers: int, inputs: Optional[Any] = None) -> Any:
    """Hardware-efficient ansatz circuit (ry-rz + cnot ladder)."""
    import jax.numpy as jnp

    from ..models.circuit import Circuit

    params = jnp.reshape(jnp.asarray(params), (nlayers + 1, 2, n))
    c = Circuit(n, inputs=inputs)
    for i in range(n):
        c.ry(i, theta=params[0, 0, i])
        c.rz(i, theta=params[0, 1, i])
    for l in range(nlayers):
        for i in range(n - 1):
            c.cnot(i, i + 1)
        for i in range(n):
            c.ry(i, theta=params[l + 1, 0, i])
            c.rz(i, theta=params[l + 1, 1, i])
    return c
