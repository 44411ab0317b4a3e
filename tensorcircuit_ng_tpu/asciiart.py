"""Terminal easter eggs (reference ``asciiart.py`` role).

Original art — a TPU pod and a lucky-draw, filling the reference's
``set_ascii``/``lucky`` niche without copying its drawings.
"""

from __future__ import annotations

import random
from typing import Any, Optional

__all__ = ["Art", "tpu_art", "lucky"]


class Art:
    def __init__(self, s: str) -> None:
        self.s = s

    def __str__(self) -> str:
        return self.s

    def __repr__(self) -> str:
        return self.s


tpu_art = Art(
    r"""
   +----+----+----+----+
   | q0 |----| q1 |    |      tensorcircuit-ng tpu
   +----+    +----+    |   ~~~~~~~~~~~~~~~~~~~~~~~~~
   |  \  MXU   |  ICI  |   flat states | fused layers
   +----+    +----+    |   einsum IR   | pallas sweeps
   | q2 |----| q3 |    |   one mesh, many chips
   +----+----+----+----+
"""
)

_FORTUNES = [
    "Your contraction path is optimal (p > 0.97).",
    "A lightcone will trim your network today.",
    "Beware the rank-n tensor; keep your states flat.",
    "The MXU favors the well-batched.",
    "jit once, scan forever.",
    "A wild NaN appears! Use adaware_svd.",
    "Entanglement grows; so does chi. Truncate wisely.",
    "Your gradients check out to 1e-5.",
]


def lucky(seed: Optional[int] = None) -> Any:
    """Draw a quantum fortune (reference ``asciiart.lucky`` role)."""
    rng = random.Random(seed)
    return Art(rng.choice(_FORTUNES))


_MESSAGES = {
    "welcome": str(tpu_art),
    "bye": "so long, and thanks for all the qubits",
}
_CURRENT = {"banner": "welcome"}


def set_ascii(b: str = "", conf: Optional[dict] = None) -> None:
    """Register/choose banner messages (reference ``asciiart.set_ascii`` role)."""
    if conf:
        _MESSAGES.update(conf)
    if b:
        _CURRENT["banner"] = b


def get_message(key: str) -> str:
    """Fetch a registered message by key (reference ``asciiart.get_message`` role)."""
    return _MESSAGES.get(key, _MESSAGES[_CURRENT["banner"]])


# reference-parity flags (asciiart.py:13,168)
visible = False
gallery = ["tpu_art"]
