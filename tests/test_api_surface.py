"""Drop-in API surface parity with the reference top level (SURVEY A.1)."""

import pytest

import tensorcircuit_ng_tpu as tc


REQUIRED = [
    # runtime config
    "set_backend", "set_dtype", "set_contractor",
    "get_backend", "get_dtype", "get_contractor",
    "runtime_backend", "runtime_dtype", "runtime_contractor",
    "set_function_backend", "set_function_dtype", "set_function_contractor",
    # simulators
    "Circuit", "DMCircuit", "DMCircuit2", "DensityMatrixCircuit",
    "DMCircuit_reference", "MPSCircuit", "StabilizerCircuit",
    "CliffordCircuit", "StabCircuit", "QuditCircuit", "AnalogCircuit",
    "U1Circuit", "SymbolCircuit", "FGSSimulator", "FGSCircuit",
    "pauli_propagation",
    # operators
    "gates", "quditgates", "Gate", "num_to_tensor", "array_to_tensor",
    "expectation", "quantum", "QuOperator", "QuVector", "QuAdjointVector",
    "QuScalar", "LinearOperator", "aslinearoperator",
    # modules
    "interfaces", "templates", "results", "compiler", "cloud", "fgs",
    "timeevol", "vis", "noisemodel", "NoiseConf", "circuit_with_noise",
    "shadows", "experimental", "translation", "simplify", "utils",
    "applications", "zx", "parallel", "DistributedContractor",
    # layers (lazy)
    "keras", "KerasLayer", "KerasHardwareLayer", "QuantumLayer",
    "torchnn", "TorchLayer", "TorchHardwareLayer",
    # misc
    "about", "cite", "backend", "cons",
]


@pytest.mark.parametrize("name", REQUIRED)
def test_export_exists(name):
    obj = getattr(tc, name)
    assert obj is not None


def test_vis_functions():
    assert callable(tc.vis.qir2tex)
    assert callable(tc.vis.render_pdf)


def test_runtime_config_roundtrip():
    assert tc.get_dtype() == "complex64"
    with tc.runtime_dtype("complex128"):
        assert tc.get_dtype() == "complex128"
    assert tc.get_dtype() == "complex64"
    tc.set_contractor("greedy")
    assert tc.get_contractor() == "greedy"
    tc.set_contractor("auto")
