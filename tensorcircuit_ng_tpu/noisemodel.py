"""Global noise configuration and unified noisy execution drivers.

Counterpart of reference ``noisemodel.py``: :class:`NoiseConf` binds Kraus
channels to gate names / qubits / predicates (``noisemodel.py:22-141``),
``circuit_with_noise`` rewrites QIR inserting channels (``:144-219``), and the
expectation/sampling drivers dispatch DMCircuit → exact vs Circuit → vmapped
Monte-Carlo trajectories (``:222-362``) with externalized ``status``
randomness so everything jits and vmaps.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple, Union

import numpy as np
import jax
import jax.numpy as jnp

from . import config
from .backend import backend as K

Tensor = Any

__all__ = [
    "NoiseConf",
    "circuit_with_noise",
    "expectation_noisfy",
    "sample_expectation_ps_noisfy",
    "channel_count",
]


class NoiseConf:
    """Noise configuration: channel lists keyed by gate name / qubit / condition.

    ``nc.add_noise("rx", kraus_list)`` — all rx gates;
    ``nc.add_noise("rx", [k1, k2], [[0], [1]])`` — qubit-specific;
    ``nc.add_noise_by_condition(pred, kraus)`` — predicate over QIR dicts;
    ``"readout"`` is a pseudo-gate carrying per-qubit [P(0|0), P(1|1)] rows
    (reference ``noisemodel.py:63-125``).
    """

    def __init__(self) -> None:
        self.nc: Dict[str, Any] = {}
        self.has_quantum = False
        self.has_readout = False
        self._conditions: List[Tuple[Callable[[Dict[str, Any]], bool], Any]] = []

    def add_noise(
        self,
        gate_name: str,
        kraus: Any,
        qubit: Optional[Sequence[Sequence[int]]] = None,
    ) -> None:
        gate_name = gate_name.lower()
        if gate_name == "readout":
            self.nc["readout"] = kraus
            self.has_readout = True
            return
        entry = self.nc.get(gate_name)
        if not isinstance(entry, dict):
            entry = {}
        if qubit is None:
            # APPEND: repeated add_noise on a gate stacks channels (the
            # reference stores a list; replacing would silently drop earlier
            # registrations)
            entry["any"] = self._as_channels(entry.get("any") or []) + self._as_channels(kraus)
        else:
            for ks, q in zip(kraus, qubit):
                prev = entry.get(tuple(q))
                entry[tuple(q)] = (
                    self._as_channels(prev) if prev is not None else []
                ) + self._as_channels(ks)
        self.nc[gate_name] = entry
        self.has_quantum = True

    def add_noise_by_condition(
        self, condition: Callable[[Dict[str, Any]], bool], kraus: Any
    ) -> None:
        self._conditions.append((condition, kraus))
        self.has_quantum = True

    @staticmethod
    def _as_channels(ks: Any) -> List[Any]:
        """Normalize: a channel is a sequence of Gates/matrices; accept both
        a bare channel and a list of channels (reference tolerates both)."""
        if isinstance(ks, (list, tuple)) and not ks:
            return []
        if isinstance(ks, (list, tuple)) and isinstance(ks[0], (list, tuple)):
            return list(ks)
        return [ks]

    def channels_for(self, qir_item: Dict[str, Any]) -> List[Any]:
        """All channel KrausLists applying to this QIR instruction."""
        out: List[Any] = []
        name = (qir_item.get("name") or "").lower()
        entry = self.nc.get(name)
        if isinstance(entry, dict):
            if "any" in entry:
                out.extend(self._as_channels(entry["any"]))
            key = tuple(qir_item["index"])
            if key in entry:
                out.extend(self._as_channels(entry[key]))
        elif entry is not None:
            out.extend(self._as_channels(entry))
        for cond, ks in self._conditions:
            if cond(qir_item):
                out.extend(self._as_channels(ks))
        return out


    def channel_count(self, c: Any) -> int:
        """Total stochastic channel SITES a noisy run of ``c`` contains —
        exactly the number of status scalars the apply loop consumes
        (ref :127)."""
        return sum(
            _channel_sites(ks, item["index"])
            for item in c.to_qir()
            for ks in self.channels_for(item)
        )


def _channel_sites(ks: Any, index: Sequence[int]) -> int:
    """Status scalars one channel consumes on a gate at ``index``: one if the
    channel matches the gate arity, else one per qubit (broadcast).  The
    single source of truth shared by every counter AND the apply loops."""
    first = ks[0].matrix() if hasattr(ks[0], "matrix") else np.asarray(ks[0])
    nsite = int(round(np.log2(np.asarray(first).shape[-1])))
    return 1 if nsite == len(index) else len(index)


def channel_count(c: Any, noise_conf: Optional[NoiseConf] = None) -> int:
    """Number of status scalars a noisy run of ``c`` will consume."""
    cnt = sum(1 for item in c.to_qir() if item.get("is_channel"))
    if noise_conf is None:
        return cnt
    for item in c.to_qir():
        for ks in noise_conf.channels_for(item):
            cnt += _channel_sites(ks, item["index"])
    return cnt


def apply_qir_with_noise(
    c: Any,
    qir: List[Dict[str, Any]],
    noise_conf: NoiseConf,
    status: Optional[Tensor] = None,
) -> Any:
    """Replay ``qir`` onto circuit ``c`` inserting configured channels.

    Reference ``noisemodel.py:144``; ``status`` drives Monte-Carlo branch
    selection for pure-state circuits (exact application on DMCircuit).
    """
    from .models.circuit import Circuit

    is_mc = isinstance(c, Circuit) and not getattr(c, "is_dm", False)
    k = 0
    for item in qir:
        c._apply_qir_item(item)
        for ks in noise_conf.channels_for(item):
            index = item["index"]
            targets = [index] if _channel_sites(ks, index) == 1 else [(q,) for q in index]
            for tgt in targets:
                if is_mc:
                    st = status[k] if status is not None else None
                    if getattr(ks, "is_unitary", False):
                        c.unitary_kraus(ks, *tgt, status=st)
                    else:
                        c.general_kraus(ks, *tgt, status=st)
                    k += 1
                else:
                    c.apply_general_kraus(ks, *tgt)
    return c


def circuit_with_noise(
    c: Any, noise_conf: NoiseConf, status: Optional[Tensor] = None
) -> Any:
    """Rebuild ``c`` with channels inserted after matching gates.

    For ``Circuit`` the channels are Monte-Carlo sampled using ``status``
    (shape ``[channel_count]``); for ``DMCircuit`` they are applied exactly
    (reference ``noisemodel.py:144-219``).
    """
    from .models.circuit import Circuit

    is_mc = isinstance(c, Circuit) and not c.is_dm
    cnew = type(c)(**c._copy_params())
    k = 0
    for item in c.to_qir():
        cnew._apply_qir_item(item)
        for ks in noise_conf.channels_for(item):
            index = item["index"]
            # single-qubit channels broadcast over the gate's qubits
            targets = [index] if _channel_sites(ks, index) == 1 else [(q,) for q in index]
            for tgt in targets:
                if is_mc:
                    st = status[k] if status is not None else None
                    if getattr(ks, "is_unitary", False):
                        cnew.unitary_kraus(ks, *tgt, status=st)
                    else:
                        cnew.general_kraus(ks, *tgt, status=st)
                    k += 1
                else:
                    cnew.apply_general_kraus(ks, *tgt)
    return cnew


def _mc_channel_count(c: Any, noise_conf: NoiseConf) -> int:
    return sum(
        _channel_sites(ks, item["index"])
        for item in c.to_qir()
        for ks in noise_conf.channels_for(item)
    )


def expectation_noisfy(
    c: Any,
    *ops: Any,
    noise_conf: Optional[NoiseConf] = None,
    nmc: int = 1000,
    status: Optional[Tensor] = None,
    **kws: Any,
) -> Tensor:
    """Noisy expectation: exact on DMCircuit, vmapped MC on Circuit.

    Reference ``noisemodel.py:309-362``.
    """
    if noise_conf is None:
        noise_conf = NoiseConf()
    from .models.densitymatrix import DMCircuit

    if isinstance(c, DMCircuit):
        cnoise = circuit_with_noise(c, noise_conf)
        return cnoise.expectation(*ops, **kws)
    num = _mc_channel_count(c, noise_conf)
    if num == 0:
        return c.expectation(*ops, **kws)
    if status is None:
        if nmc < 1:
            raise ValueError(
                "nmc must be >= 1 for Monte-Carlo noise on a Circuit "
                "(an empty trajectory mean is NaN); for the exact channel "
                "evolution run the same QIR on a DMCircuit instead"
            )
        status = K.implicit_randu([nmc, num])
    elif status.shape[-1] != num:
        # JAX clamps out-of-bounds gathers silently, which would silently
        # CORRELATE trajectory randomness — fail loudly instead
        raise ValueError(
            f"status last dim {status.shape[-1]} != channel count {num}"
        )

    def core(st: Tensor) -> Tensor:
        cnoise = circuit_with_noise(c, noise_conf, status=st)
        return jnp.real(cnoise.expectation(*ops, **kws))

    vals = jax.vmap(core)(status)
    return jnp.mean(vals)


def sample_expectation_ps_noisfy(
    c: Any,
    x: Optional[Sequence[int]] = None,
    y: Optional[Sequence[int]] = None,
    z: Optional[Sequence[int]] = None,
    noise_conf: Optional[NoiseConf] = None,
    nmc: int = 1000,
    shots: Optional[int] = None,
    status: Optional[Tensor] = None,
    statusc: Optional[Tensor] = None,
    **kws: Any,
) -> Tensor:
    """Noisy shot-based Pauli expectation (reference ``noisemodel.py:222-306``)."""
    if noise_conf is None:
        noise_conf = NoiseConf()
    readout_error = noise_conf.nc.get("readout") if noise_conf.has_readout else None
    from .models.densitymatrix import DMCircuit

    if isinstance(c, DMCircuit):
        cnoise = circuit_with_noise(c, noise_conf)
        return cnoise.sample_expectation_ps(
            x=x, y=y, z=z, shots=shots, readout_error=readout_error, status=status, **kws
        )
    num = _mc_channel_count(c, noise_conf)
    if num == 0:
        return c.sample_expectation_ps(
            x=x, y=y, z=z, shots=shots, readout_error=readout_error, status=status, **kws
        )
    if statusc is None:
        statusc = K.implicit_randu([nmc, num])

    def core(st: Tensor) -> Tensor:
        cnoise = circuit_with_noise(c, noise_conf, status=st)
        return jnp.real(
            cnoise.sample_expectation_ps(
                x=x,
                y=y,
                z=z,
                shots=shots,
                readout_error=readout_error,
                status=status,
                **kws,
            )
        )

    vals = jax.vmap(core)(statusc)
    return jnp.mean(vals)
