"""Gate registry: fixed and parameterized quantum gates.

Mirrors the reference's gate surface (reference ``gates.py:185-1232``) with a
TPU-first design: gate *matrices* are pure functions of (parameters, dtype) —
no global re-materialization step like the reference's ``meta_gate()``
(reference ``gates.py:497-519``); instead fixed matrices are cached per dtype
and variable gates are traced-through jnp functions so every gate is
jit/vmap/grad transparent.

A :class:`Gate` here is just a named wrapper around a dense tensor of shape
``(d,)*2k`` — there is no mutable tensor-network node graph.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Callable, List, Optional, Sequence, Tuple

import numpy as np

import jax.numpy as jnp

from .. import config

Tensor = Any

__all__ = [
    "Gate",
    "GateF",
    "GateVF",
    "num_to_tensor",
    "array_to_tensor",
]


def num_to_tensor(*nums: Any, dtype: Optional[str] = None) -> Any:
    """Convert python numbers / arrays to backend tensors at the active dtype."""
    dtype = dtype or config.dtypestr()
    out = [jnp.asarray(n).astype(jnp.dtype(dtype)) for n in nums]
    if len(out) == 1:
        return out[0]
    return out


array_to_tensor = num_to_tensor

PAULI_CHAR_TO_INDEX = {"I": 0, "X": 1, "Y": 2, "Z": 3}  # reference gates.py:52

# canonical single-qubit basis states (reference gates.py:33-36); kept as
# NUMPY constants so they lift into traces without a complex device-put
zero_state = np.array([1.0, 0.0], dtype=np.complex64)
one_state = np.array([0.0, 1.0], dtype=np.complex64)
plus_state = (zero_state + one_state) / np.sqrt(2.0)
minus_state = (zero_state - one_state) / np.sqrt(2.0)


class Gate:
    """A dense gate tensor with a name; shape ``(d,)*2k`` or matrix form.

    Replacement for the reference's ``Gate(tn.Node)`` (reference
    ``gates.py:185``) without the tensor-network object graph.
    """

    def __init__(self, tensor: Tensor, name: str = "any") -> None:
        # keep concrete tensors as NUMPY: complex jax device arrays cannot be
        # lowered as jit constants on the axon TPU backend (see _xp_of), and
        # numpy lifts into both eager and traced jnp ops for free.
        if not hasattr(tensor, "ndim"):
            tensor = np.asarray(tensor)
        self.tensor = tensor
        self.name = name

    def copy(self) -> "Gate":
        return Gate(self.tensor, self.name)

    def __repr__(self) -> str:
        return f"Gate(name={self.name!r}, shape={tuple(self.tensor.shape)})"

    @property
    def shape(self) -> Tuple[int, ...]:
        return tuple(self.tensor.shape)

    def matrix(self) -> Tensor:
        t = self.tensor
        dim = int(np.sqrt(np.prod(t.shape)))
        return t.reshape(dim, dim)


# ------------------------------------------------------------------
# fixed matrices (numpy, re-cast per dtype on demand)
# ------------------------------------------------------------------

_SQRT2 = math.sqrt(2.0)

_i_matrix = np.eye(2)
_x_matrix = np.array([[0, 1], [1, 0]])
_y_matrix = np.array([[0, -1j], [1j, 0]])
_z_matrix = np.array([[1, 0], [0, -1]])
_h_matrix = np.array([[1, 1], [1, -1]]) / _SQRT2
_s_matrix = np.array([[1, 0], [0, 1j]])
_sd_matrix = _s_matrix.conj().T
_t_matrix = np.array([[1, 0], [0, np.exp(1j * np.pi / 4)]])
_td_matrix = _t_matrix.conj().T
_wroot_matrix = np.array(
    [[1, -np.sqrt(1j)], [np.sqrt(-1j), 1]]
) / _SQRT2  # sqrt of W=(X+Y)/sqrt(2), reference gates.py
_sx_matrix = 0.5 * np.array([[1 + 1j, 1 - 1j], [1 - 1j, 1 + 1j]])  # sqrt(X)


def _two_qubit(m: np.ndarray) -> np.ndarray:
    return m


def _controlled(m: np.ndarray, num_ctrl: int = 1) -> np.ndarray:
    dim = m.shape[0]
    full = np.eye(dim * (2**num_ctrl), dtype=complex)
    full[-dim:, -dim:] = m
    return full


_cnot_matrix = _controlled(_x_matrix)
_cy_matrix = _controlled(_y_matrix)
_cz_matrix = _controlled(_z_matrix)
_ch_matrix = _controlled(_h_matrix)
_swap_matrix = np.array(
    [[1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0], [0, 0, 0, 1]]
)
_iswap_fixed_matrix = np.array(
    [[1, 0, 0, 0], [0, 0, 1j, 0], [0, 1j, 0, 0], [0, 0, 0, 1]]
)
_toffoli_matrix = _controlled(_x_matrix, 2)
_fredkin_matrix = _controlled(_swap_matrix, 1)

_FIXED_GATES: dict[str, np.ndarray] = {
    "i": _i_matrix,
    "x": _x_matrix,
    "y": _y_matrix,
    "z": _z_matrix,
    "h": _h_matrix,
    "s": _s_matrix,
    "sd": _sd_matrix,
    "t": _t_matrix,
    "td": _td_matrix,
    "wroot": _wroot_matrix,
    "sx": _sx_matrix,
    "cnot": _cnot_matrix,
    "cy": _cy_matrix,
    "cz": _cz_matrix,
    "ch": _ch_matrix,
    "swap": _swap_matrix,
    "toffoli": _toffoli_matrix,
    "fredkin": _fredkin_matrix,
}

# aliases per reference gates.py (cx=cnot, ccnot=toffoli, cswap=fredkin, ox/oy/oz
# are 0-controlled)
GATE_ALIASES: dict[str, str] = {
    "cx": "cnot",
    "ccnot": "toffoli",
    "ccx": "toffoli",
    "cswap": "fredkin",
}


def _zero_controlled(m: np.ndarray) -> np.ndarray:
    full = np.eye(m.shape[0] * 2, dtype=complex)
    full[: m.shape[0], : m.shape[0]] = m
    return full


_FIXED_GATES["ox"] = _zero_controlled(_x_matrix)
_FIXED_GATES["oy"] = _zero_controlled(_y_matrix)
_FIXED_GATES["oz"] = _zero_controlled(_z_matrix)


@functools.lru_cache(maxsize=None)
def _fixed_np(name: str, dtype: str) -> np.ndarray:
    m = _FIXED_GATES[name]
    nq = int(round(math.log2(m.shape[0])))
    return np.ascontiguousarray(m.astype(np.dtype(dtype)).reshape((2,) * (2 * nq)))


def _fixed_tensor(name: str, dtype: str) -> Tensor:
    # NOTE: stays numpy — cached constants must not be device arrays (they
    # could not outlive a trace, and complex device arrays cannot be lowered
    # as jit constants on axon).
    return _fixed_np(name, dtype)


# ------------------------------------------------------------------
# parameterized matrices (numpy when concrete, jnp when traced)
# ------------------------------------------------------------------
#
# AXON/TPU CONSTRAINT: complex jax device arrays cannot be lowered as jit
# constants on the axon TPU backend (the MLIR constant handler needs a
# device->host fetch, which is UNIMPLEMENTED for complex buffers over the
# tunnel), while *numpy* complex constants lift into XLA programs directly.
# So gate matrices built from concrete parameters must be plain numpy; only
# traced parameters flow through jnp.  ``_xp_of`` picks the namespace.


def _xp_of(*vals: Any) -> Any:
    import jax

    for v in vals:
        if isinstance(v, jax.core.Tracer):
            return jnp
        if isinstance(v, jax.Array):
            try:
                np.asarray(v)  # real scalars/arrays fetch fine eagerly
            except Exception:  # pragma: no cover - complex device array
                return jnp
    return np


def _pauli(dtype: str, xp: Any = jnp) -> Tuple[Tensor, Tensor, Tensor, Tensor]:
    d = np.dtype(dtype)
    if xp is np:
        return (
            _i_matrix.astype(d),
            _x_matrix.astype(d),
            _y_matrix.astype(d),
            _z_matrix.astype(d),
        )
    return (
        jnp.asarray(_i_matrix, dtype=d),
        jnp.asarray(_x_matrix, dtype=d),
        jnp.asarray(_y_matrix, dtype=d),
        jnp.asarray(_z_matrix, dtype=d),
    )


def _theta(theta: Any, dtype: str, xp: Any = jnp) -> Tensor:
    return xp.asarray(theta).astype(np.dtype(dtype))


def _set_block(m: Tensor, rows: Any, cols: Any, val: Tensor, xp: Any) -> Tensor:
    if xp is np:
        m = m.copy()
        m[rows, cols] = val
        return m
    return m.at[rows, cols].set(val)


def rzm_diagonal(theta: Any, k: int, dtype: Any) -> Tensor:
    """Diagonal of exp(-i theta/2 Z^{⊗k}) as a length-2^k vector.

    Concrete theta stays NUMPY at full precision (axon complex-constant
    rule: a concrete complex jax array cannot lower as a jit constant);
    traced theta builds in-trace at ``dtype``.  Single source of truth for
    the QIR densify pass and the einsum-IR hyperedge lowering.
    """
    import jax as _jax

    zs = np.array([(-1) ** bin(i).count("1") for i in range(2**k)])
    if isinstance(theta, _jax.core.Tracer):
        d = np.dtype(dtype)
        return jnp.exp(
            np.asarray(-0.5j).astype(d)
            * jnp.asarray(theta).astype(d)
            * jnp.asarray(zs.astype(d))
        )
    return np.exp(-0.5j * float(np.asarray(theta)) * zs).astype(np.dtype(dtype))


def rgate_matrix(theta: Any = 0, alpha: Any = 0, phi: Any = 0, dtype: Optional[str] = None) -> Tensor:
    r"""General single-qubit rotation ``exp(-i theta n(alpha, phi) . sigma)``.

    Matches reference ``gates.rgate`` (``gates.py:700-741``):
    ``n = (sin(alpha) cos(phi), sin(alpha) sin(phi), cos(alpha))``.
    """
    dtype = dtype or config.dtypestr()
    xp = _xp_of(theta, alpha, phi)
    i, x, y, z = _pauli(dtype, xp)
    theta, alpha, phi = (_theta(v, dtype, xp) for v in (theta, alpha, phi))
    nx = xp.sin(alpha) * xp.cos(phi)
    ny = xp.sin(alpha) * xp.sin(phi)
    nz = xp.cos(alpha)
    axis = nx * x + ny * y + nz * z
    return xp.cos(theta) * i - 1j * xp.sin(theta) * axis


def rx_matrix(theta: Any = 0, dtype: Optional[str] = None) -> Tensor:
    r"""``exp(-i theta/2 X)``."""
    dtype = dtype or config.dtypestr()
    xp = _xp_of(theta)
    i, x, _, _ = _pauli(dtype, xp)
    theta = _theta(theta, dtype, xp)
    return xp.cos(theta / 2) * i - 1j * xp.sin(theta / 2) * x


def ry_matrix(theta: Any = 0, dtype: Optional[str] = None) -> Tensor:
    dtype = dtype or config.dtypestr()
    xp = _xp_of(theta)
    i, _, y, _ = _pauli(dtype, xp)
    theta = _theta(theta, dtype, xp)
    return xp.cos(theta / 2) * i - 1j * xp.sin(theta / 2) * y


def rz_matrix(theta: Any = 0, dtype: Optional[str] = None) -> Tensor:
    dtype = dtype or config.dtypestr()
    xp = _xp_of(theta)
    i, _, _, z = _pauli(dtype, xp)
    theta = _theta(theta, dtype, xp)
    return xp.cos(theta / 2) * i - 1j * xp.sin(theta / 2) * z


def phase_matrix(theta: Any = 0, dtype: Optional[str] = None) -> Tensor:
    """diag(1, exp(i theta)) (reference ``gates.phase_gate``)."""
    dtype = dtype or config.dtypestr()
    xp = _xp_of(theta)
    theta = _theta(theta, dtype, xp)
    one = xp.ones((), dtype=np.dtype(dtype))
    return xp.diag(xp.stack([one, xp.exp(1j * theta)]))


def u_matrix(theta: Any = 0, phi: Any = 0, lbd: Any = 0, dtype: Optional[str] = None) -> Tensor:
    r"""OpenQASM U(theta, phi, lambda) gate (reference ``gates.u_gate``)."""
    dtype = dtype or config.dtypestr()
    xp = _xp_of(theta, phi, lbd)
    theta, phi, lbd = (_theta(v, dtype, xp) for v in (theta, phi, lbd))
    c = xp.cos(theta / 2)
    s = xp.sin(theta / 2)
    return xp.stack(
        [
            xp.stack([c, -xp.exp(1j * lbd) * s]),
            xp.stack([xp.exp(1j * phi) * s, xp.exp(1j * (phi + lbd)) * c]),
        ]
    )


def cu_matrix(theta: Any = 0, phi: Any = 0, lbd: Any = 0, dtype: Optional[str] = None) -> Tensor:
    dtype = dtype or config.dtypestr()
    xp = _xp_of(theta, phi, lbd)
    u = u_matrix(theta, phi, lbd, dtype=dtype)
    m = xp.eye(4, dtype=np.dtype(dtype))
    return _set_block(m, slice(2, None), slice(2, None), u, xp)


def _kron2(a: Tensor, b: Tensor, xp: Any = jnp) -> Tensor:
    return xp.kron(a, b)


def rxx_matrix(theta: Any = 0, dtype: Optional[str] = None) -> Tensor:
    r"""``exp(-i theta/2 X⊗X)``."""
    dtype = dtype or config.dtypestr()
    xp = _xp_of(theta)
    i, x, _, _ = _pauli(dtype, xp)
    theta = _theta(theta, dtype, xp)
    xx = _kron2(x, x, xp)
    i4 = xp.eye(4, dtype=np.dtype(dtype))
    return xp.cos(theta / 2) * i4 - 1j * xp.sin(theta / 2) * xx


def ryy_matrix(theta: Any = 0, dtype: Optional[str] = None) -> Tensor:
    dtype = dtype or config.dtypestr()
    xp = _xp_of(theta)
    _, _, y, _ = _pauli(dtype, xp)
    theta = _theta(theta, dtype, xp)
    yy = _kron2(y, y, xp)
    i4 = xp.eye(4, dtype=np.dtype(dtype))
    return xp.cos(theta / 2) * i4 - 1j * xp.sin(theta / 2) * yy


def rzz_matrix(theta: Any = 0, dtype: Optional[str] = None) -> Tensor:
    dtype = dtype or config.dtypestr()
    xp = _xp_of(theta)
    _, _, _, z = _pauli(dtype, xp)
    theta = _theta(theta, dtype, xp)
    zz = _kron2(z, z, xp)
    i4 = xp.eye(4, dtype=np.dtype(dtype))
    return xp.cos(theta / 2) * i4 - 1j * xp.sin(theta / 2) * zz


def crx_matrix(theta: Any = 0, dtype: Optional[str] = None) -> Tensor:
    dtype = dtype or config.dtypestr()
    xp = _xp_of(theta)
    m = xp.eye(4, dtype=np.dtype(dtype))
    return _set_block(m, slice(2, None), slice(2, None), rx_matrix(theta, dtype=dtype), xp)


def cry_matrix(theta: Any = 0, dtype: Optional[str] = None) -> Tensor:
    dtype = dtype or config.dtypestr()
    xp = _xp_of(theta)
    m = xp.eye(4, dtype=np.dtype(dtype))
    return _set_block(m, slice(2, None), slice(2, None), ry_matrix(theta, dtype=dtype), xp)


def crz_matrix(theta: Any = 0, dtype: Optional[str] = None) -> Tensor:
    dtype = dtype or config.dtypestr()
    xp = _xp_of(theta)
    m = xp.eye(4, dtype=np.dtype(dtype))
    return _set_block(m, slice(2, None), slice(2, None), rz_matrix(theta, dtype=dtype), xp)


def cphase_matrix(theta: Any = 0, dtype: Optional[str] = None) -> Tensor:
    dtype = dtype or config.dtypestr()
    xp = _xp_of(theta)
    m = xp.eye(4, dtype=np.dtype(dtype))
    return _set_block(m, 3, 3, xp.exp(1j * _theta(theta, dtype, xp)), xp)


def iswap_matrix(theta: Any = 1.0, dtype: Optional[str] = None) -> Tensor:
    r"""Parameterized iswap: ``exp(i theta pi/2 (X⊗X + Y⊗Y)/2)``.

    ``theta=1`` gives the standard iSWAP (reference ``gates.iswap_gate``
    ``gates.py:784-826``).
    """
    dtype = dtype or config.dtypestr()
    xp = _xp_of(theta)
    _, x, y, _ = _pauli(dtype, xp)
    theta = _theta(theta, dtype, xp)
    gen = (_kron2(x, x, xp) + _kron2(y, y, xp)) / 2.0
    i4 = xp.eye(4, dtype=np.dtype(dtype))
    # gen has eigenvalues {0, ±1}; exp(i a gen) = I + (cos a - 1) gen^2 + i sin a gen
    a = theta * (np.pi / 2)
    gen2 = gen @ gen
    return i4 + (xp.cos(a) - 1.0) * gen2 + 1j * xp.sin(a) * gen


def exponential_matrix(unitary: Tensor, theta: Any = 0, dtype: Optional[str] = None) -> Tensor:
    r"""``exp(-i theta G)`` via matrix exponential (reference ``gates.exponential_gate``)."""
    dtype = dtype or config.dtypestr()
    xp = _xp_of(unitary, theta)
    theta = _theta(theta, dtype, xp)
    g = xp.asarray(unitary).astype(np.dtype(dtype))
    dim = int(np.sqrt(np.prod(np.array(g.shape))))
    if xp is np:
        import scipy.linalg as sl

        return sl.expm(-1j * theta * g.reshape(dim, dim))
    import jax.scipy.linalg as jsl

    return jsl.expm(-1j * theta * g.reshape(dim, dim))


def exp1_matrix(unitary: Tensor, theta: Any = 0, dtype: Optional[str] = None) -> Tensor:
    r"""``exp(-i theta G)`` for G with ``G^2 = I`` (fast closed form).

    Reference ``gates.exp1_gate`` (``gates.py:894-955``): cos(theta) I -
    i sin(theta) G.
    """
    dtype = dtype or config.dtypestr()
    xp = _xp_of(unitary, theta)
    theta = _theta(theta, dtype, xp)
    g = xp.asarray(unitary).astype(np.dtype(dtype))
    dim = int(np.sqrt(np.prod(np.array(g.shape))))
    g = g.reshape(dim, dim)
    i = xp.eye(dim, dtype=np.dtype(dtype))
    return xp.cos(theta) * i - 1j * xp.sin(theta) * g


def rzm_matrix(theta: Any = 0, dtype: Optional[str] = None) -> Tensor:
    """Diagonal of rz (for the diagonal fast path)."""
    dtype = dtype or config.dtypestr()
    xp = _xp_of(theta)
    theta = _theta(theta, dtype, xp)
    return xp.stack([xp.exp(-1j * theta / 2), xp.exp(1j * theta / 2)])


def su4_matrix(theta: Tensor, dtype: Optional[str] = None) -> Tensor:
    """Generic SU(4) two-qubit gate from 15 parameters (KAK-like form).

    Reference ``gates.su4_gate`` (``gates.py:956-980``): single-qubit u gates
    on each side plus an XX+YY+ZZ interaction core.
    """
    dtype = dtype or config.dtypestr()
    xp = _xp_of(theta)
    theta = xp.asarray(theta)
    pre0 = u_matrix(theta[0], theta[1], theta[2], dtype=dtype)
    pre1 = u_matrix(theta[3], theta[4], theta[5], dtype=dtype)
    post0 = u_matrix(theta[9], theta[10], theta[11], dtype=dtype)
    post1 = u_matrix(theta[12], theta[13], theta[14], dtype=dtype)
    core = (
        rxx_matrix(theta[6], dtype=dtype)
        @ ryy_matrix(theta[7], dtype=dtype)
        @ rzz_matrix(theta[8], dtype=dtype)
    )
    return _kron2(post0, post1, xp) @ core @ _kron2(pre0, pre1, xp)


def multicontrol_matrix(
    unitary: Tensor, ctrl: Sequence[int], dtype: Optional[str] = None
) -> Tensor:
    """Multi-controlled gate; ``ctrl[i]`` in {0,1} selects control polarity.

    Reference ``gates.multicontrol_gate`` (``gates.py:981-1057``) builds an
    MPO; here we build the dense matrix (fine for small k) — the dense
    statevector engine applies it as one tensordot.
    """
    dtype = dtype or config.dtypestr()
    xp = _xp_of(unitary)
    u = xp.asarray(unitary).astype(np.dtype(dtype))
    dim_u = int(np.sqrt(np.prod(np.array(u.shape))))
    u = u.reshape(dim_u, dim_u)
    nctrl = len(ctrl)
    dim = dim_u * 2**nctrl
    m = xp.eye(dim, dtype=np.dtype(dtype))
    # the active control block index: bits of ctrl pattern
    idx = 0
    for c in ctrl:
        idx = idx * 2 + int(c)
    start = idx * dim_u
    return _set_block(m, slice(start, start + dim_u), slice(start, start + dim_u), u, xp)


# ------------------------------------------------------------------
# gate factories (GateF / GateVF)
# ------------------------------------------------------------------


class GateF:
    """Factory for fixed (non-parameterized) gates.

    ``g = GateF("h"); g() -> Gate``; supports ``.adjoint()`` and
    ``.controlled()`` like reference ``gates.py:298-387``.
    """

    def __init__(
        self,
        name: str,
        matrix_fn: Optional[Callable[..., Tensor]] = None,
        n: int = 1,
        ctrl: Optional[List[int]] = None,
    ) -> None:
        self.n = name
        self.name = name
        self._matrix_fn = matrix_fn
        self.nqubits = n
        #: control-bit pattern accumulated by controlled()/ocontrolled()
        #: (reference gates.py GateF.ctrl; [] for uncontrolled gates)
        self.ctrl: List[int] = list(ctrl) if ctrl is not None else []

    def __call__(self, *args: Any, **kws: Any) -> Gate:
        dtype = kws.pop("dtype", None) or config.dtypestr()
        if self._matrix_fn is not None:
            m = self._matrix_fn(*args, dtype=dtype, **kws)
            nq = int(round(math.log2(int(np.sqrt(np.prod(np.array(m.shape)))) if m.ndim == 2 else 2 ** (m.ndim // 2))))
            dim = int(np.sqrt(np.prod(np.array(m.shape))))
            nq = int(round(math.log2(dim)))
            return Gate(m.reshape((2,) * (2 * nq)), name=self.name)
        return Gate(_fixed_tensor(self.name, dtype), name=self.name)

    def matrix(self, *args: Any, **kws: Any) -> Tensor:
        return self(*args, **kws).matrix()

    def adjoint(self) -> "GateF":
        base = self

        def adj_fn(*args: Any, dtype: Optional[str] = None, **kws: Any) -> Tensor:
            m = base(*args, dtype=dtype, **kws).matrix()
            return m.T.conj()

        return GateF(self.name + "d", adj_fn, self.nqubits)

    def ided(self, before: bool = True) -> "GateF":
        """Tensor an identity wire onto the gate (reference ``gates.py:323``)."""
        base = self

        def ided_fn(*args: Any, dtype: Optional[str] = None, **kws: Any) -> Tensor:
            m = np.asarray(base(*args, dtype=dtype, **kws).matrix())
            eye = np.eye(2, dtype=m.dtype)
            return np.kron(eye, m) if before else np.kron(m, eye)

        return GateF(("ip" if before else "ia") + self.name, ided_fn, self.nqubits + 1)

    def controlled(self) -> "GateF":
        base = self

        def ctrl_fn(*args: Any, dtype: Optional[str] = None, **kws: Any) -> Tensor:
            m = base(*args, dtype=dtype, **kws).matrix()
            dim = m.shape[0]
            xp = _xp_of(m)
            out = xp.eye(2 * dim, dtype=m.dtype)
            return _set_block(out, slice(dim, None), slice(dim, None), m, xp)

        return GateF("c" + self.name, ctrl_fn, self.nqubits + 1, ctrl=[1] + self.ctrl)

    def ocontrolled(self) -> "GateF":
        base = self

        def ctrl_fn(*args: Any, dtype: Optional[str] = None, **kws: Any) -> Tensor:
            m = base(*args, dtype=dtype, **kws).matrix()
            dim = m.shape[0]
            xp = _xp_of(m)
            out = xp.eye(2 * dim, dtype=m.dtype)
            return _set_block(out, slice(None, dim), slice(None, dim), m, xp)

        return GateF("o" + self.name, ctrl_fn, self.nqubits + 1, ctrl=[0] + self.ctrl)

    def __repr__(self) -> str:
        return f"GateF({self.name!r})"


class GateVF(GateF):
    """Factory for variable (parameterized) gates; same protocol as GateF."""

    def __init__(
        self,
        matrix_fn: Callable[..., Tensor],
        name: str,
        n: int = 1,
        default_params: Optional[dict] = None,
    ):
        super().__init__(name, matrix_fn, n)
        self.default_params = default_params or {}

    def __call__(self, *args: Any, **kws: Any) -> Gate:
        dtype = kws.pop("dtype", None) or config.dtypestr()
        params = dict(self.default_params)
        params.update(kws)
        m = self._matrix_fn(*args, dtype=dtype, **params)
        dim = int(np.sqrt(np.prod(np.array(m.shape))))
        nq = int(round(math.log2(dim)))
        return Gate(m.reshape((2,) * (2 * nq)), name=self.name)


# registry ----------------------------------------------------------------

#: fixed gate factories, one per entry in the reference registry
_fixed_names = list(_FIXED_GATES.keys())

_VARIABLE_FNS: dict[str, Tuple[Callable[..., Tensor], int]] = {
    "r": (rgate_matrix, 1),
    "rx": (rx_matrix, 1),
    "ry": (ry_matrix, 1),
    "rz": (rz_matrix, 1),
    "phase": (phase_matrix, 1),
    "u": (u_matrix, 1),
    "cu": (cu_matrix, 2),
    "rxx": (rxx_matrix, 2),
    "ryy": (ryy_matrix, 2),
    "rzz": (rzz_matrix, 2),
    "crx": (crx_matrix, 2),
    "cry": (cry_matrix, 2),
    "crz": (crz_matrix, 2),
    "cphase": (cphase_matrix, 2),
    "iswap": (iswap_matrix, 2),
    "exp": (exponential_matrix, 0),  # nqubits from the generator
    "exp1": (exp1_matrix, 0),
    "exponential": (exponential_matrix, 0),
    "su4": (su4_matrix, 2),
    "multicontrol": (multicontrol_matrix, 0),
}

VARIABLE_ALIASES = {
    "cr": "cphase",
    "cp": "cphase",
    "crr": "cphase",
}


def _build_registry() -> dict[str, GateF]:
    reg: dict[str, GateF] = {}
    for name, m in _FIXED_GATES.items():
        nq = int(round(math.log2(m.shape[0])))
        reg[name] = GateF(name, None, nq)
    for alias, target in GATE_ALIASES.items():
        reg[alias] = GateF(target, None, reg[target].nqubits)
        reg[alias].name = target
    for name, (fn, nq) in _VARIABLE_FNS.items():
        reg[name] = GateVF(fn, name, nq)
    for alias, target in VARIABLE_ALIASES.items():
        fn, nq = _VARIABLE_FNS[target]
        reg[alias] = GateVF(fn, target, nq)
    return reg


GATES: dict[str, GateF] = _build_registry()

#: names of gates that take no parameters
FIXED_GATE_NAMES = _fixed_names + list(GATE_ALIASES.keys())
#: names of parameterized gates
VARIABLE_GATE_NAMES = list(_VARIABLE_FNS.keys()) + list(VARIABLE_ALIASES.keys())


def get_gate(name: str) -> GateF:
    name = name.lower()
    if name not in GATES:
        raise KeyError(f"unknown gate {name!r}")
    return GATES[name]


def matrix_for_gate(name: str, dtype: Optional[str] = None, **params: Any) -> Tensor:
    """Dense matrix of a registered gate at the active dtype."""
    g = get_gate(name)(**params) if params else get_gate(name)(dtype=dtype)
    return g.matrix()


# module-level factory shortcuts matching reference export style
# (tc.gates.h, tc.gates.rx, ...)
def __getattr__(attr: str) -> Any:
    key = attr
    if key.endswith("_gate"):
        key = key[: -len("_gate")]
    if key in GATES:
        return GATES[key]
    raise AttributeError(f"module 'gates' has no attribute {attr!r}")


def batched_unitary(thetas: Tensor, nqubits: int = 1) -> Tensor:
    """Batch of Haar-structured unitaries from parameter rows (reference ``gates.py:419``).

    Builds U = exp(i H(theta)) per batch row with H hermitian assembled from
    the row; vmapped and jit/AD transparent.
    """
    import jax

    thetas = jnp.asarray(thetas)
    dim = 2**nqubits

    def one(th: Tensor) -> Tensor:
        need = dim * dim
        th = jnp.resize(th, (need,))
        m = jnp.reshape(th, (dim, dim))
        h = (m + jnp.conj(m.T)) / 2.0 + 1j * (m - jnp.conj(m.T)) / 2.0
        h = (h + jnp.conj(h.T)) / 2.0
        e, v = jnp.linalg.eigh(h)
        return (v * jnp.exp(1j * e)[None, :]) @ jnp.conj(v.T)

    if thetas.ndim == 1:
        return one(thetas.astype(jnp.dtype(config.dtypestr())))
    return jax.vmap(one)(thetas.astype(jnp.dtype(config.dtypestr())))


def pauli_gates(dtype: Optional[str] = None) -> list:
    """[I, X, Y, Z] matrices at the active dtype."""
    dtype = dtype or config.dtypestr()
    return list(_pauli(dtype))


# ======================================================================
# reference-parity gate helpers (gates.py:323-1232)
# ======================================================================


def meta_gate() -> None:
    """(Re)materialize fixed-gate matrices at the current dtype.

    Reference ``gates.py:497-519``: the reference rebuilds module-level gate
    constants after ``set_dtype``; our registry builds matrices lazily per
    call with the live dtype, so this is a cache-refresh no-op kept for API
    parity.
    """


def meta_vgate() -> None:
    """Parity stub of reference ``gates.py:1192`` (lazy variable gates)."""


def bmatrix(a: Any) -> str:
    r"""LaTeX bmatrix text of a 2D array (reference ``gates.py:547``)."""
    a = np.asarray(a)
    if a.ndim > 2:
        raise ValueError("bmatrix can at most display two dimensions")
    lines = np.array2string(a, max_line_width=10**8).replace("[", "").replace("]", "").splitlines()
    body = "\\\\\n".join("    " + " & ".join(ln.split()) for ln in lines if ln.strip())
    return "\\begin{bmatrix}\n" + body + "\n\\end{bmatrix}"


def matrix_for_gate(gate: Gate) -> np.ndarray:
    """Dense numpy matrix of a Gate (reference helper)."""
    return np.asarray(gate.matrix())


def get_u_parameter(m: Any) -> Tuple[float, float, float]:
    """(theta, phi, lbd) of u3 from a single-qubit unitary (reference :606)."""
    m = np.asarray(m).reshape(2, 2)
    phase = np.linalg.det(m) ** (-0.5)
    u = phase * m  # SU(2)
    theta = 2 * np.arctan2(abs(u[1, 0]), abs(u[0, 0]))
    phi_plus_lam = 2 * np.angle(u[1, 1])
    phi_minus_lam = 2 * np.angle(u[1, 0])
    phi = (phi_plus_lam + phi_minus_lam) / 2.0
    lam = (phi_plus_lam - phi_minus_lam) / 2.0
    return float(theta), float(phi), float(lam)


def rgate_theoretical(theta: float = 0, alpha: float = 0, phi: float = 0) -> Gate:
    r"""R gate via explicit matrix exponential (reference ``gates.py:749``)."""
    import scipy.linalg as sl

    x = np.array([[0, 1], [1, 0]], dtype=complex)
    y = np.array([[0, -1j], [1j, 0]], dtype=complex)
    z = np.diag([1.0, -1.0]).astype(complex)
    h = (
        np.sin(alpha) * np.cos(phi) * x
        + np.sin(alpha) * np.sin(phi) * y
        + np.cos(alpha) * z
    )
    return Gate(sl.expm(-1j * theta * h), name="r")


def random_single_qubit_gate() -> Gate:
    """Haar-ish random 1q gate via random r angles (reference :777)."""
    theta, alpha, phi = np.random.rand(3) * 2 * np.pi
    return Gate(np.asarray(rgate_matrix(theta, alpha, phi)), name="R1Q")


def random_two_qubit_gate() -> Gate:
    """Haar-random two-qubit gate (reference ``gates.py:852``)."""
    from scipy.stats import unitary_group

    u = unitary_group.rvs(dim=4).astype(np.complex64)
    return Gate(u.reshape(2, 2, 2, 2), name="R2Q")


def any_gate(unitary: Any, name: str = "any") -> Gate:
    """Wrap a dense unitary as a Gate (reference ``gates.py:419`` role)."""
    return Gate(unitary, name=name)


def exponential_gate_unity(unitary: Any, theta: Any, half: bool = False, name: str = "none") -> Gate:
    r"""exp(-iθU) for U² = I via cosθ·I - i sinθ·U (reference ``gates.py:921``)."""
    m = exp1_matrix(unitary, theta / 2.0 if half else theta)
    return Gate(m, name=name)


exponential_gate = lambda unitary, theta, name="none": Gate(  # noqa: E731
    exponential_matrix(unitary, theta), name=name
)


def diagonal_gate(diag: Any, name: str = "diagonal") -> Gate:
    """Gate from a diagonal vector (reference ``gates.py:1058`` family)."""
    diag = np.asarray(diag)
    return Gate(np.diag(diag), name=name)


def rzm_gate(theta: Any = 0) -> Gate:
    """Multi-Z-parity rotation gate (reference ``rzm`` family)."""
    return Gate(np.asarray(rzm_matrix(theta)), name="rzm")


def cmz_gate(theta: Any = 0) -> Gate:
    """Controlled-Z-parity phase gate (reference ``cmz``)."""
    diag = np.exp(-1j * float(np.real(np.asarray(theta))) * np.array([0.0, 0.0, 0.0, 1.0]))
    return Gate(np.diag(diag).reshape(2, 2, 2, 2), name="cmz")


def mpo_gate(mpo: Any, name: str = "mpo") -> Any:
    """Pass-through MPO gate constructor (reference ``gates.py`` mpo family)."""
    return mpo


