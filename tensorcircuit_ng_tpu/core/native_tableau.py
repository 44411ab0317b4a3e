"""ctypes wrapper for the C++ bit-packed CHP tableau (native/tableau.cpp).

Drop-in replacement for :class:`tensorcircuit_ng_tpu.core.tableau.Tableau`
(same method surface), ~64x less memory traffic per rowsum and bit-parallel
phase popcounts — the stim-role native engine (reference
``stabilizercircuit.py:7`` rides stim; SURVEY.md §2.6).  Built with g++ on
first use; ``native_tableau_available()`` gates the fast path.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)

__all__ = ["NativeTableau", "native_tableau_available", "make_tableau"]

_LIB: Optional[ctypes.CDLL] = None
_LIB_TRIED = False

_GATE_CODES = {
    "h": 0, "s": 1, "sd": 2, "x_gate": 3, "y_gate": 4, "z_gate": 5,
    "sx": 6, "cnot": 7, "cz": 8, "cy": 9, "swap": 10, "iswap": 11,
}


def _native_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")


def _build_lib() -> Optional[str]:
    src = os.path.join(_native_dir(), "tableau.cpp")
    out = os.path.join(_native_dir(), "libtableau.so")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", out, src],
            check=True, capture_output=True, timeout=120,
        )
        return out
    except (OSError, subprocess.SubprocessError) as e:  # pragma: no cover
        logger.warning("tableau native build failed: %s", e)
        return None


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    path = _build_lib()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.tab_new.restype = ctypes.c_void_p
    lib.tab_new.argtypes = [ctypes.c_int]
    lib.tab_free.argtypes = [ctypes.c_void_p]
    lib.tab_copy.restype = ctypes.c_void_p
    lib.tab_copy.argtypes = [ctypes.c_void_p]
    lib.tab_gate.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.tab_measure.restype = ctypes.c_int
    lib.tab_measure.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
    lib.tab_expect.restype = ctypes.c_int
    lib.tab_expect.argtypes = [
        ctypes.c_void_p,
        np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS"),
    ]
    lib.tab_sample.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_uint64,
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
    ]
    lib.tab_entropy_rank.restype = ctypes.c_int
    lib.tab_entropy_rank.argtypes = [
        ctypes.c_void_p,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ctypes.c_int,
    ]
    lib.tab_is_random.restype = ctypes.c_int
    lib.tab_is_random.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.tab_get.argtypes = [
        ctypes.c_void_p,
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
    ]
    _LIB = lib
    return _LIB


def native_tableau_available() -> bool:
    return _load() is not None


def _pack_bits(bits: np.ndarray) -> np.ndarray:
    """(n,) uint8 -> little-endian packed uint64 words."""
    n = bits.shape[0]
    W = (n + 63) // 64
    padded = np.zeros(W * 64, dtype=np.uint8)
    padded[:n] = bits
    b = np.packbits(padded.reshape(W, 64), axis=1, bitorder="little")
    return b.view(np.uint64).reshape(W).copy()


class NativeTableau:
    """CHP tableau backed by the C++ bit-packed engine (same API as Tableau)."""

    def __init__(self, n: int, _handle: Optional[int] = None):
        lib = _load()
        if lib is None:
            raise RuntimeError("native tableau library unavailable (no g++?)")
        self._lib = lib
        self.n = n
        self._h = _handle if _handle is not None else lib.tab_new(n)

    def __del__(self):  # pragma: no cover - interpreter teardown
        try:
            if getattr(self, "_h", None):
                self._lib.tab_free(self._h)
                self._h = None
        except Exception:
            pass

    def copy(self) -> "NativeTableau":
        return NativeTableau(self.n, _handle=self._lib.tab_copy(self._h))

    # gates (same names as core.tableau.Tableau)
    def _g1(self, name: str, q: int) -> None:
        self._lib.tab_gate(self._h, _GATE_CODES[name], int(q), -1)

    def _g2(self, name: str, a: int, b: int) -> None:
        self._lib.tab_gate(self._h, _GATE_CODES[name], int(a), int(b))

    def h(self, q: int) -> None: self._g1("h", q)
    def s(self, q: int) -> None: self._g1("s", q)
    def sd(self, q: int) -> None: self._g1("sd", q)
    def x_gate(self, q: int) -> None: self._g1("x_gate", q)
    def y_gate(self, q: int) -> None: self._g1("y_gate", q)
    def z_gate(self, q: int) -> None: self._g1("z_gate", q)
    def sx(self, q: int) -> None: self._g1("sx", q)
    def cnot(self, c: int, t: int) -> None: self._g2("cnot", c, t)
    def cz(self, c: int, t: int) -> None: self._g2("cz", c, t)
    def cy(self, c: int, t: int) -> None: self._g2("cy", c, t)
    def swap(self, a: int, b: int) -> None: self._g2("swap", a, b)
    def iswap(self, a: int, b: int) -> None: self._g2("iswap", a, b)

    def is_random(self, q: int) -> bool:
        return bool(self._lib.tab_is_random(self._h, int(q)))

    def measure(self, q: int, status: Optional[float] = None) -> int:
        rnd = (
            int(np.random.randint(2)) if status is None else int(float(status) >= 0.5)
        )
        return self._lib.tab_measure(self._h, int(q), rnd) & 1

    def expectation_pauli(
        self, xs: Sequence[int], zs: Sequence[int], ys: Sequence[int] = ()
    ) -> int:
        px = np.zeros(self.n, dtype=np.uint8)
        pz = np.zeros(self.n, dtype=np.uint8)
        for q in xs:
            px[q] = 1
        for q in zs:
            pz[q] = 1
        for q in ys:
            px[q] ^= 1
            pz[q] ^= 1
        return int(self._lib.tab_expect(self._h, _pack_bits(px), _pack_bits(pz)))

    def sample(self, shots: int, seed: int = 0) -> np.ndarray:
        """[shots, n] uint8 full-register Z samples (fresh copy per shot)."""
        out = np.zeros((shots, self.n), dtype=np.uint8)
        self._lib.tab_sample(self._h, int(shots), np.uint64(seed or 0x2545F4914F6CDD1D), out)
        return out

    def entanglement_entropy(self, region: Sequence[int]) -> float:
        reg = np.asarray(sorted(int(r) for r in region), dtype=np.int32)
        rank = self._lib.tab_entropy_rank(self._h, reg, len(reg))
        return float((rank - len(reg)) * np.log(2.0))

    def stabilizers(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        n = self.n
        x = np.zeros((2 * n, n), dtype=np.uint8)
        z = np.zeros((2 * n, n), dtype=np.uint8)
        r = np.zeros(2 * n, dtype=np.uint8)
        self._lib.tab_get(self._h, x, z, r)
        return x[n:], z[n:], r[n:]

    # parity with Tableau attribute access used in a few places
    @property
    def x(self) -> np.ndarray:
        n = self.n
        x = np.zeros((2 * n, n), dtype=np.uint8)
        z = np.zeros((2 * n, n), dtype=np.uint8)
        r = np.zeros(2 * n, dtype=np.uint8)
        self._lib.tab_get(self._h, x, z, r)
        return x

    @property
    def z(self) -> np.ndarray:
        n = self.n
        x = np.zeros((2 * n, n), dtype=np.uint8)
        z = np.zeros((2 * n, n), dtype=np.uint8)
        r = np.zeros(2 * n, dtype=np.uint8)
        self._lib.tab_get(self._h, x, z, r)
        return z

    @property
    def r(self) -> np.ndarray:
        n = self.n
        x = np.zeros((2 * n, n), dtype=np.uint8)
        z = np.zeros((2 * n, n), dtype=np.uint8)
        r = np.zeros(2 * n, dtype=np.uint8)
        self._lib.tab_get(self._h, x, z, r)
        return r


def make_tableau(n: int, prefer_native: bool = True):
    """Factory: native C++ tableau when available, numpy engine otherwise."""
    if prefer_native and native_tableau_available():
        return NativeTableau(n)
    from .tableau import Tableau

    return Tableau(n)
