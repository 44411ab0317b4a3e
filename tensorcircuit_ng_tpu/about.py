"""Environment/version report (reference ``about.py:12``) and citation."""

from __future__ import annotations

import platform
import sys

__all__ = ["about", "cite"]


def about() -> str:
    """Print and return the environment report."""
    lines = []
    lines.append(f"OS info: {platform.platform(aliased=True)}")
    lines.append(
        f"Python version: {sys.version_info[0]}.{sys.version_info[1]}.{sys.version_info[2]}"
    )
    try:
        import numpy

        lines.append(f"Numpy version: {numpy.__version__}")
    except ImportError:
        pass
    try:
        import jax
        import jaxlib

        lines.append(f"Jax version: {jax.__version__}")
        lines.append(f"Jaxlib version: {jaxlib.__version__}")
        try:
            devs = jax.devices()
            lines.append(f"Jax devices: {devs}")
        except Exception:
            lines.append("Jax devices: <unavailable>")
    except ImportError:
        pass
    for mod in ("optax", "flax", "scipy", "sympy", "networkx", "torch"):
        try:
            m = __import__(mod)
            lines.append(f"{mod} version: {getattr(m, '__version__', '?')}")
        except ImportError:
            pass
    from . import __version__

    lines.append(f"tensorcircuit_ng_tpu version: {__version__}")
    report = "\n".join(lines)
    print(report)
    return report


def cite(format: str = "bibtex") -> str:
    """Citation info for the framework design lineage."""
    bib = """@article{tensorcircuit,
  title = {TensorCircuit: a Quantum Software Framework for the NISQ Era},
  journal = {Quantum},
  volume = {7}, pages = {912}, year = {2023}, doi = {10.22331/q-2023-02-02-912}
}"""
    print(bib)
    return bib
