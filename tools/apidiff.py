"""Runtime API-parity checker vs the reference at /root/reference.

AST-walks every public def/class in the reference package and checks each
symbol exists somewhere in our loaded modules (and each mapped class has
every reference method).  Run from the repo root:

    PYTHONPATH=. python tools/apidiff.py

Both sections printing empty means full parity (state at end of round 1).
When adding new modules, extend the import list below so find_symbol can
see them.
"""
import ast, os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS","cpu")
import jax; jax.config.update("jax_platforms","cpu")
import tensorcircuit_ng_tpu as tc

REF = "/root/reference/tensorcircuit"

# assignment-bound names that are NOT public API surface, each with a reason:
_ASSIGN_NOISE = {
    # generic type aliases / re-exported types
    "logger","Tensor","Graph","Array","Matrix","Gate","thismodule","Circuit",
    "npdtype","dtypestr","rdtypestr","module2backend","backend2module",
    "Opt","Model","Symbol","Operator","dtype",
    # bare import rebinds (reference assigns modules/classes it imported)
    "jaxlib","ctg","Mesh","NamedSharding","P","npb","backend_numpy",
    # module-internal state/caches with no user contract
    "graph_instances","local_devices","task_list","connection_errors",
    "sep","sep2","tencent_base_url","saved_token",
    # reference-internal symbolic registries; ours keeps them as functions
    "SYM_SGATE_MAP","SYM_VGATE_MAP",
    # reference-internal engine constants tied to its own data layout
    "SPARSE_WORD_QUBITS","SAMPLE_FORMAT",
    # reference vqes module-level numpy scratch constants
    "xx","yy","zz","pauli",
}

def pub(path):
    tree = ast.parse(open(path).read())
    out = {}
    for node in tree.body:
        if isinstance(node,(ast.FunctionDef,ast.AsyncFunctionDef)) and not node.name.startswith("_"):
            out[node.name]="fn"
        elif isinstance(node, ast.ClassDef) and not node.name.startswith("_"):
            out[node.name]=sorted(n.name for n in node.body if isinstance(n,(ast.FunctionDef,ast.AsyncFunctionDef)) and not n.name.startswith("_"))
        elif isinstance(node, ast.Assign):
            # assignment-bound public API (aliases, partials, module constants)
            for t in node.targets:
                if isinstance(t, ast.Name) and not t.id.startswith("_") and t.id.isidentifier():
                    if t.id in _ASSIGN_NOISE:
                        continue
                    out.setdefault(t.id, "fn")
        elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
            if not node.target.id.startswith("_") and node.target.id not in _ASSIGN_NOISE:
                out.setdefault(node.target.id, "fn")
    return out

# runtime targets to search for module-level fns and classes
import tensorcircuit_ng_tpu.quantum, tensorcircuit_ng_tpu.timeevol, tensorcircuit_ng_tpu.shadows
import tensorcircuit_ng_tpu.noisemodel, tensorcircuit_ng_tpu.experimental, tensorcircuit_ng_tpu.simplify
import tensorcircuit_ng_tpu.translation, tensorcircuit_ng_tpu.utils, tensorcircuit_ng_tpu.vis
import tensorcircuit_ng_tpu.ops.gates, tensorcircuit_ng_tpu.ops.channels, tensorcircuit_ng_tpu.ops.quditgates, tensorcircuit_ng_tpu.ops.symbolgates
import tensorcircuit_ng_tpu.templates.lattice, tensorcircuit_ng_tpu.templates.measurements, tensorcircuit_ng_tpu.templates.hamiltonians
import tensorcircuit_ng_tpu.templates.blocks, tensorcircuit_ng_tpu.templates.graphs, tensorcircuit_ng_tpu.templates.conversions
import tensorcircuit_ng_tpu.templates.ansatz, tensorcircuit_ng_tpu.templates.dataset, tensorcircuit_ng_tpu.templates.chems
import tensorcircuit_ng_tpu.results.counts, tensorcircuit_ng_tpu.results.readout_mitigation
import tensorcircuit_ng_tpu.interfaces, tensorcircuit_ng_tpu.compiler, tensorcircuit_ng_tpu.cloud.apis
import tensorcircuit_ng_tpu.cloud.abstraction, tensorcircuit_ng_tpu.cloud.wrapper, tensorcircuit_ng_tpu.cloud.local
import tensorcircuit_ng_tpu.zx as zx
import tensorcircuit_ng_tpu.models.pauliprop, tensorcircuit_ng_tpu.models.fgs
import tensorcircuit_ng_tpu.models.mpscircuit, tensorcircuit_ng_tpu.models.analogcircuit
import tensorcircuit_ng_tpu.models.symbolcircuit, tensorcircuit_ng_tpu.models.u1circuit
import tensorcircuit_ng_tpu.applications.vags, tensorcircuit_ng_tpu.asciiart
import tensorcircuit_ng_tpu.cloud.utils, tensorcircuit_ng_tpu.cloud.tencent, tensorcircuit_ng_tpu.cloud.quafu_provider
import tensorcircuit_ng_tpu.interfaces.jax, tensorcircuit_ng_tpu.keras
import tensorcircuit_ng_tpu.core.contractor, tensorcircuit_ng_tpu.models.mps_base, tensorcircuit_ng_tpu.models.tebd
import tensorcircuit_ng_tpu.zx.converter, tensorcircuit_ng_tpu.zx.noise_model, tensorcircuit_ng_tpu.zx.scalar_graph, tensorcircuit_ng_tpu.zx.utils, tensorcircuit_ng_tpu.zx.stabilizertcircuit
import tensorcircuit_ng_tpu.results.qem.qem_methods, tensorcircuit_ng_tpu.results.qem.benchmark_circuits
import tensorcircuit_ng_tpu.applications as apps
for sub in ["dqas","van","vqes","optimization","graphdata","layers","ensemble","finance","physics"]:
    try: __import__(f"tensorcircuit_ng_tpu.applications.{sub}")
    except Exception as e: print("app import fail",sub,e)

import sys
MODS = [m for n,m in sys.modules.items() if n.startswith("tensorcircuit_ng_tpu")]

def find_symbol(name):
    hits=[]
    for m in MODS:
        if hasattr(m,name): hits.append(m.__name__)
    return hits

CLASSMAP = {  # reference class -> our runtime object
 "AbstractCircuit": tc.Circuit, "BaseCircuit": tc.Circuit, "Circuit": tc.Circuit,
 "DMCircuit": tc.DMCircuit, "DMCircuit2": tc.DMCircuit,
 "MPSCircuit": tc.MPSCircuit, "StabilizerCircuit": tc.StabilizerCircuit,
 "QuditCircuit": tc.QuditCircuit, "U1Circuit": tc.U1Circuit,
 "FGSSimulator": tc.FGSSimulator, "AnalogCircuit": tc.AnalogCircuit,
 "SymbolCircuit": tc.SymbolCircuit,
}
import glob
files = sorted(glob.glob(os.path.join(REF,"**","*.py"), recursive=True))
skip_prefixes = ("backends/","applications/ai","applications/finance","applications/physics","applications/utils")
missing_fns = {}
missing_methods = {}
for f in files:
    rel = os.path.relpath(f, REF)
    if any(rel.startswith(s) for s in skip_prefixes) or rel=="__init__.py" or rel.endswith("__init__.py"): continue
    try: d = pub(f)
    except Exception: continue
    for name, kind in d.items():
        if kind=="fn":
            if not find_symbol(name):
                missing_fns.setdefault(rel,[]).append(name)
        else:
            target = CLASSMAP.get(name)
            if target is None:
                hits = find_symbol(name)
                if not hits:
                    missing_fns.setdefault(rel,[]).append(f"class {name}")
                    continue
                for m in MODS:
                    if hasattr(m,name): target = getattr(m,name); break
            mm=[meth for meth in kind if not hasattr(target,meth)]
            if mm: missing_methods.setdefault(rel,[]).append(f"{name}: {','.join(mm)}")

# abstract-backend method surface: every public method the reference's
# ExtendedBackend/abstract backend declares must exist on our JaxBackend.
ab_missing = []
ab_path = os.path.join(REF, "backends", "abstract_backend.py")
if os.path.exists(ab_path):
    tree = ast.parse(open(ab_path).read())
    for node in ast.walk(tree):
        if isinstance(node, ast.ClassDef):
            for meth in node.body:
                if isinstance(meth, (ast.FunctionDef, ast.AsyncFunctionDef)) and not meth.name.startswith("_"):
                    if not hasattr(tc.backend, meth.name):
                        ab_missing.append(meth.name)
if ab_missing:
    print("=== MISSING abstract-backend methods on tc.backend ===")
    print(", ".join(sorted(set(ab_missing))))

print("=== MISSING module-level symbols (nowhere in our package) ===")
for k in sorted(missing_fns):
    print(f"{k}: {', '.join(missing_fns[k])}")
print("\n=== MISSING methods on mapped classes ===")
for k in sorted(missing_methods):
    for line in missing_methods[k]: print(f"{k} :: {line}")
