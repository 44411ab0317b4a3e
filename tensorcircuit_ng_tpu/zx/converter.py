"""Circuit → ZX-graph conversion (reference ``zx/converter.py:1092``)."""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional

import numpy as np

from .graph import ZXGraph

__all__ = ["circuit_to_zx"]


def circuit_to_zx(c: Any) -> ZXGraph:
    """Convert a circuit's QIR into a ZX diagram.

    Supported gates: h, x, y, z, s, sd, t, td, rz, rx, cz, cnot, swap,
    cphase, rzz (phase gadget).  The diagram's open legs are the circuit's
    input and output wires.
    """
    n = c.nqubits
    g = ZXGraph()
    frontier: List[int] = []
    for q in range(n):
        b = g.add_spider("B")
        g.inputs.append(b)
        frontier.append(b)
    # frontier edges are "pending": we connect as we append spiders
    pending_had = [False] * n  # a pending hadamard on the wire

    def attach(q: int, sid: int) -> None:
        g.add_edge(frontier[q], sid, hadamard=pending_had[q])
        pending_had[q] = False
        frontier[q] = sid

    for item in c.to_qir():
        name = (item.get("name") or "").lower()
        idx = item["index"]
        params = item.get("parameters", {})
        theta = params.get("theta")
        tval = float(np.real(np.asarray(theta))) if theta is not None else 0.0
        if name == "h":
            pending_had[idx[0]] = not pending_had[idx[0]]
        elif name in ("z", "s", "sd", "t", "td", "rz", "phase"):
            phase = {
                "z": math.pi,
                "s": math.pi / 2,
                "sd": -math.pi / 2,
                "t": math.pi / 4,
                "td": -math.pi / 4,
            }.get(name, tval)
            if name == "rz":
                phase = tval
                # rz = e^{-iθ/2} Z-phase(θ): global phase tracked separately
            s = g.add_spider("Z", phase)
            attach(idx[0], s)
        elif name in ("x", "rx"):
            phase = math.pi if name == "x" else tval
            s = g.add_spider("X", phase)
            attach(idx[0], s)
        elif name == "y":
            s1 = g.add_spider("Z", math.pi)
            attach(idx[0], s1)
            s2 = g.add_spider("X", math.pi)
            attach(idx[0], s2)
        elif name in ("cnot", "cx"):
            cq, tq = idx
            zc = g.add_spider("Z", 0.0)
            xt = g.add_spider("X", 0.0)
            attach(cq, zc)
            attach(tq, xt)
            g.add_edge(zc, xt)
            g.scalar_power2 += 1  # cnot normalization: sqrt(2)
        elif name == "cz":
            a, b = idx
            za = g.add_spider("Z", 0.0)
            zb = g.add_spider("Z", 0.0)
            attach(a, za)
            attach(b, zb)
            g.add_edge(za, zb, hadamard=True)
            g.scalar_power2 += 1
        elif name == "swap":
            a, b = idx
            frontier[a], frontier[b] = frontier[b], frontier[a]
            pending_had[a], pending_had[b] = pending_had[b], pending_had[a]
        elif name == "rzz":
            # phase gadget: Z spiders on both wires linked to an X hub with a
            # phase-θ Z head
            a, b = idx
            za = g.add_spider("Z", 0.0)
            zb = g.add_spider("Z", 0.0)
            attach(a, za)
            attach(b, zb)
            hub = g.add_spider("X", 0.0)
            head = g.add_spider("Z", tval)
            g.add_edge(za, hub)
            g.add_edge(zb, hub)
            g.add_edge(hub, head)
            g.scalar_power2 += 0
        elif name == "cphase":
            # cphase(θ) = exp(iθ/4) rz(θ/2)⊗rz(θ/2) · rzz(-θ/2)-style gadget
            a, b = idx
            za = g.add_spider("Z", tval / 2)
            zb = g.add_spider("Z", tval / 2)
            attach(a, za)
            attach(b, zb)
            hub = g.add_spider("X", 0.0)
            head = g.add_spider("Z", -tval / 2)
            g.add_edge(za, hub)
            g.add_edge(zb, hub)
            g.add_edge(hub, head)
        else:
            raise ValueError(f"gate {name!r} has no ZX conversion yet")
    for q in range(n):
        b = g.add_spider("B")
        g.add_edge(frontier[q], b, hadamard=pending_had[q])
        pending_had[q] = False
        g.outputs.append(b)
        frontier[q] = b
    return g
