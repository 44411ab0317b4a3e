"""Mega benchmark function sweep (reference ``benchmarks/scripts_v2/benchmark_core.py``).

Same configuration space — circuit type (dense/DM/MPS), 1d/2d layout,
operation (state/sample/exps), MC noise, grad/vmap/vvag — on the TPU-native
engines.  Produces jitted callables; timing lives in :mod:`benchmark_cli`.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from typing import Any, Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu import noisemodel
from tensorcircuit_ng_tpu.ops import channels


def generate_1d_circuit(c: Any, params: Any, nqubits: int, nlayers: int) -> Any:
    for i in range(nqubits):
        c.h(i)
    for j in range(nlayers):
        for i in range(nqubits):
            c.rx(i, theta=params[j, i])
        for i in range(nqubits - 1):
            c.cx(i, i + 1)
    return c


def generate_2d_circuit(c: Any, lx: int, ly: int, params: Any, nqubits: int, nlayers: int) -> Any:
    assert nqubits == lx * ly
    for i in range(nqubits):
        c.h(i)
    for j in range(nlayers):
        for i in range(nqubits):
            c.rx(i, theta=params[j, i])
        for x in range(lx):
            for y in range(ly):
                idx = x * ly + y
                if x < lx - 1:
                    c.cx(idx, idx + ly)
                if y < ly - 1:
                    c.cx(idx, idx + 1)
    return c


def generate_noisy_circuit(c: Any, status: Any, type: str = "depolarizing") -> Any:
    noise_conf = noisemodel.NoiseConf()
    if type == "depolarizing":
        error1 = channels.depolarizingchannel(0.1, 0.1, 0.1)
    elif type == "amplitudedamping":
        error1 = channels.amplitudedampingchannel(0.2, 0.1)
    else:
        raise ValueError("Noise type not supported")
    noise_conf.add_noise("h", error1)
    noise_conf.add_noise("rx", error1)
    return noisemodel.circuit_with_noise(c, noise_conf, status)


def get_sample(c: Any) -> Any:
    return c.sample(allow_state=False, batch=1)[0]


def get_state(c: Any) -> Any:
    return c.state()


def get_exps(c: Any) -> Any:
    return jnp.real(c.expectation_ps(z=[0]))


def benchmark_mega_function(
    nqubits: int,
    nlayers: int,
    lx: int = 0,
    ly: int = 0,
    circuit_type: str = "circuit",
    bond_dim: int = 16,
    layout_type: str = "1d",
    operation: str = "state",
    noisy: bool = False,
    noisy_type: str = "depolarizing",
    use_grad: bool = False,
    use_vmap: bool = False,
    contractor: Optional[str] = None,
    jit_compile: bool = True,
) -> Callable[..., Any]:
    """Build the configured benchmark callable (reference ``:66-180``)."""

    def circuit_func(params: Any) -> Any:
        if circuit_type == "circuit":
            c: Any = tc.Circuit(nqubits)
        elif circuit_type == "dmcircuit":
            c = tc.DMCircuit(nqubits)
        elif circuit_type == "mpscircuit":
            c = tc.MPSCircuit(nqubits)
            c.set_split_rules({"max_singular_values": bond_dim})
        else:
            raise ValueError(circuit_type)
        if layout_type == "1d":
            c = generate_1d_circuit(c, params, nqubits, nlayers)
        else:
            c = generate_2d_circuit(c, lx, ly, params, nqubits, nlayers)
        if noisy and circuit_type in ("circuit", "dmcircuit"):
            status = jnp.asarray(np.random.uniform(size=2048), dtype=jnp.float32)
            c = generate_noisy_circuit(c, status, noisy_type)
        if operation == "state":
            return get_state(c)
        if operation == "sample":
            return get_sample(c)
        return get_exps(c)

    if contractor is not None and circuit_type in ("circuit", "dmcircuit"):
        circuit_func = tc.set_function_contractor(contractor)(circuit_func)

    from tensorcircuit_ng_tpu.backend import backend as K

    if use_grad and not use_vmap:
        return jax.jit(jax.grad(lambda p: jnp.real(jnp.sum(circuit_func(p)))))
    if use_vmap and not use_grad:
        return jax.jit(jax.vmap(circuit_func))
    if use_grad and use_vmap:
        return jax.jit(K.vvag(lambda p: jnp.real(jnp.sum(circuit_func(p)))))
    if jit_compile:
        return jax.jit(circuit_func)
    return circuit_func
