"""Regenerate docs/api.md from live docstrings."""
import sys, inspect, importlib
sys.path.insert(0, "/root/repo")
import jax; jax.config.update("jax_platforms", "cpu")

MODULES = [
    "tensorcircuit_ng_tpu",
    "tensorcircuit_ng_tpu.quantum",
    "tensorcircuit_ng_tpu.timeevol",
    "tensorcircuit_ng_tpu.shadows",
    "tensorcircuit_ng_tpu.noisemodel",
    "tensorcircuit_ng_tpu.experimental",
    "tensorcircuit_ng_tpu.simplify",
    "tensorcircuit_ng_tpu.config",
    "tensorcircuit_ng_tpu.core.einsum_ir",
    "tensorcircuit_ng_tpu.core.contractor",
    "tensorcircuit_ng_tpu.core.statevec",
    "tensorcircuit_ng_tpu.core.kernels",
    "tensorcircuit_ng_tpu.core.kernels_jacobi",
    "tensorcircuit_ng_tpu.core.linalg",
    "tensorcircuit_ng_tpu.ops.gates",
    "tensorcircuit_ng_tpu.ops.channels",
    "tensorcircuit_ng_tpu.ops.quditgates",
    "tensorcircuit_ng_tpu.ops.symbolgates",
    "tensorcircuit_ng_tpu.models.circuit",
    "tensorcircuit_ng_tpu.models.densitymatrix",
    "tensorcircuit_ng_tpu.models.mpscircuit",
    "tensorcircuit_ng_tpu.models.mps_base",
    "tensorcircuit_ng_tpu.models.tebd",
    "tensorcircuit_ng_tpu.models.stabilizercircuit",
    "tensorcircuit_ng_tpu.models.quditcircuit",
    "tensorcircuit_ng_tpu.models.u1circuit",
    "tensorcircuit_ng_tpu.models.fgs",
    "tensorcircuit_ng_tpu.models.analogcircuit",
    "tensorcircuit_ng_tpu.models.symbolcircuit",
    "tensorcircuit_ng_tpu.models.pauliprop",
    "tensorcircuit_ng_tpu.zx",
    "tensorcircuit_ng_tpu.zx.graph_s",
    "tensorcircuit_ng_tpu.zx.noise_model",
    "tensorcircuit_ng_tpu.zx.scalar_graph",
    "tensorcircuit_ng_tpu.zx.stabilizertcircuit",
    "tensorcircuit_ng_tpu.parallel.distributed",
    "tensorcircuit_ng_tpu.parallel.mesh",
    "tensorcircuit_ng_tpu.templates.lattice",
    "tensorcircuit_ng_tpu.templates.measurements",
    "tensorcircuit_ng_tpu.templates.hamiltonians",
    "tensorcircuit_ng_tpu.templates.blocks",
    "tensorcircuit_ng_tpu.results.counts",
    "tensorcircuit_ng_tpu.results.readout_mitigation",
    "tensorcircuit_ng_tpu.results.qem.qem_methods",
    "tensorcircuit_ng_tpu.interfaces",
    "tensorcircuit_ng_tpu.interfaces.tensortrans",
    "tensorcircuit_ng_tpu.compiler.simple_compiler",
    "tensorcircuit_ng_tpu.compiler.composed_compiler",
    "tensorcircuit_ng_tpu.cloud.apis",
    "tensorcircuit_ng_tpu.cloud.wrapper",
    "tensorcircuit_ng_tpu.applications.dqas",
    "tensorcircuit_ng_tpu.applications.vags",
    "tensorcircuit_ng_tpu.applications.vqes",
    "tensorcircuit_ng_tpu.applications.van",
    "tensorcircuit_ng_tpu.applications.optimization",
    "tensorcircuit_ng_tpu.applications.graphdata",
    "tensorcircuit_ng_tpu.applications.layers",
    "tensorcircuit_ng_tpu.translation",
    "tensorcircuit_ng_tpu.keras",
    "tensorcircuit_ng_tpu.torchnn",
    "tensorcircuit_ng_tpu.vis",
    "tensorcircuit_ng_tpu.dmrg",
    "tensorcircuit_ng_tpu.utils",
]

def firstline(doc):
    if not doc:
        return ""
    return doc.strip().splitlines()[0]

out = ["# API reference (generated from docstrings)", ""]
for modname in MODULES:
    try:
        mod = importlib.import_module(modname)
    except Exception as e:
        print("skip", modname, e)
        continue
    out.append(f"## `{modname}`")
    out.append("")
    if mod.__doc__:
        out.append(firstline(mod.__doc__))
        out.append("")
    names = getattr(mod, "__all__", None) or sorted(
        n for n in dir(mod) if not n.startswith("_")
    )
    for name in sorted(set(names)):
        obj = getattr(mod, name, None)
        if obj is None:
            continue
        if inspect.isclass(obj):
            out.append(f"- **`{name}`** — {firstline(obj.__doc__)}")
            for mname, m in sorted(vars(obj).items()):
                if mname.startswith("_") or not callable(m):
                    continue
                out.append(f"    - `.{mname}()` — {firstline(getattr(m, '__doc__', ''))}")
        elif callable(obj):
            try:
                sig = str(inspect.signature(obj))
            except (ValueError, TypeError):
                sig = "(...)"
            out.append(f"- **`{name}{sig}`** — {firstline(obj.__doc__)}")
    out.append("")

open("/root/repo/docs/api.md", "w").write("\n".join(out) + "\n")
print("wrote", len(out), "lines")
