"""tensorcircuit_ng_tpu — TPU-native quantum circuit simulation framework.

A ground-up rebuild of TensorCircuit-NG's capabilities (reference mounted at
/root/reference) designed for JAX/XLA/Pallas/pjit on TPU: dense statevector
and einsum-IR engines, exact and Monte-Carlo noise, differentiable /
jittable / vmappable end to end, sharded distribution over device meshes.

Public API mirrors the reference top level (reference ``__init__.py:11-121``)
so user code ports with an import swap: ``import tensorcircuit_ng_tpu as tc``.
"""

__version__ = "0.1.0"

from . import config as _config_mod
from .config import (
    set_dtype,
    get_dtype,
    set_backend,
    get_backend,
    set_contractor,
    get_contractor,
    runtime_dtype,
    runtime_backend,
    runtime_contractor,
    set_function_dtype,
    set_function_backend,
    set_function_contractor,
)
from .backend import backend, JaxBackend
from .ops import gates
from .ops import channels
from .ops.gates import Gate, num_to_tensor, array_to_tensor
from .models.circuit import Circuit, expectation
from .models.densitymatrix import DMCircuit, DMCircuit2, DensityMatrixCircuit
from . import quantum
from .quantum import (
    QuOperator,
    QuVector,
    QuAdjointVector,
    QuScalar,
    PauliStringSum2COO,
    PauliStringSum2Dense,
    PauliStringSum2MVP,
    aslinearoperator,
    LinearOperator,
)

# module namespace parity with the reference
from . import noisemodel
from .noisemodel import NoiseConf, circuit_with_noise

cons = _config_mod  # reference exposes runtime config as tc.cons


def __getattr__(name):  # lazy heavy/optional submodules
    import importlib

    lazy = {
        "MPSCircuit": (".models.mpscircuit", "MPSCircuit"),
        "ParallelTEBD": (".models.tebd", "ParallelTEBD"),
        "FiniteMPS": (".models.mps_base", "FiniteMPS"),
        "QuditCircuit": (".models.quditcircuit", "QuditCircuit"),
        "U1Circuit": (".models.u1circuit", "U1Circuit"),
        "StabilizerCircuit": (".models.stabilizercircuit", "StabilizerCircuit"),
        "CliffordCircuit": (".models.stabilizercircuit", "StabilizerCircuit"),
        "StabCircuit": (".models.stabilizercircuit", "StabilizerCircuit"),
        "FGSSimulator": (".models.fgs", "FGSSimulator"),
        "FGSCircuit": (".models.fgs", "FGSSimulator"),
        "FGSTestSimulator": (".models.fgs", "FGSTestSimulator"),
        "AnalogCircuit": (".models.analogcircuit", "AnalogCircuit"),
        "SymbolCircuit": (".models.symbolcircuit", "SymbolCircuit"),
        "pauli_propagation": (".models.pauliprop", "pauli_propagation"),
        "PauliPropagationEngine": (".models.pauliprop", "PauliPropagationEngine"),
        "SparsePauliPropagationEngine": (
            ".models.pauliprop",
            "SparsePauliPropagationEngine",
        ),
        "DMCircuit_reference": (".models.densitymatrix", "DMCircuit"),
        "timeevol": (".timeevol", None),
        "shadows": (".shadows", None),
        "experimental": (".experimental", None),
        "interfaces": (".interfaces", None),
        "templates": (".templates", None),
        "results": (".results", None),
        "compiler": (".compiler", None),
        "cloud": (".cloud", None),
        "translation": (".translation", None),
        "vis": (".vis", None),
        "about": (".about", "about"),
        "cite": (".about", "cite"),
        "keras": (".keras", None),
        "KerasLayer": (".keras", "KerasLayer"),
        "KerasHardwareLayer": (".keras", "KerasHardwareLayer"),
        "TorchHardwareLayer": (".torchnn", "TorchHardwareLayer"),
        "HardwareNet": (".torchnn", "HardwareNet"),
        "QuantumLayer": (".keras", "QuantumLayer"),
        "torchnn": (".torchnn", None),
        "TorchLayer": (".torchnn", "TorchLayer"),
        "QuantumNet": (".torchnn", "QuantumNet"),
        "fgs": (".models.fgs", None),
        "quditgates": (".ops.quditgates", None),
        "parallel": (".parallel", None),
        "DistributedContractor": (".parallel.distributed", "DistributedContractor"),
        "get_tn_info": (".core.contractor", "get_tn_info"),
        "contraction_info": (".core.contractor", "contraction_info"),
        "simplify": (".simplify", None),
        "utils": (".utils", None),
        "applications": (".applications", None),
        "zx": (".zx", None),
        "symbolgates": (".models.symbolcircuit", None),
    }
    if name in lazy:
        mod_name, attr = lazy[name]
        mod = importlib.import_module(mod_name, __name__)
        obj = mod if attr is None else getattr(mod, attr)
        globals()[name] = obj
        return obj
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
