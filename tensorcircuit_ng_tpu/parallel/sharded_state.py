"""Sharded statevector simulation: the flat state split across a device mesh.

The reference scales contraction by slicing only (reference
``experimental.py:760-1249``); a TPU-native framework can instead hold ONE
exact statevector across chips: the (2^n,) state is sharded on its leading
axis over a 1D mesh (the top ``k = log2(ndev)`` qubits index the device),
every gate on the remaining ``n - k`` qubits is embarrassingly local, and
gates touching top qubits run as butterfly exchanges over ICI
(``jax.lax.ppermute``).  At 8 GB HBM per v5e chip a 16-chip pod holds
n = 33-34 exact complex64 states (local chunk 2^{n-4}); the per-gate
communication for a top-qubit gate is one full-state exchange, everything
else is bandwidth-local.

Design: gates are applied inside ONE ``shard_map``-decorated program (jit
over the whole circuit), so XLA fuses local gate chains and schedules the
ppermutes on ICI; there is no per-gate dispatch.

Top-qubit k-local gates are handled by swapping the top qubit with a free
local qubit (one pairwise exchange each way), applying the gate locally,
and swapping back — the universal fallback; diagonal top-qubit gates skip
the swap and apply with device-dependent phases.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core import statevec

Tensor = Any

__all__ = ["ShardedStatevec"]


def _as_local_gate(g: Any) -> Any:
    g = statevec._as_nd(g)
    return g


class ShardedStatevec:
    """Exact n-qubit statevector sharded over a 1D device mesh.

    Usage::

        mesh = Mesh(np.array(jax.devices()), ("sv",))
        sv = ShardedStatevec(n, mesh)
        psi = sv.init_zero()

        @jax.jit
        def program(psi, thetas):
            psi = sv.h(psi, 0)
            psi = sv.apply(psi, rx_matrix(thetas[0]), [5])
            ...
            return sv.expectation_z(psi, [0, 1])

    All methods are functional (state in, state out) and must be called
    inside a jit so the whole circuit is one SPMD program.
    """

    def __init__(self, n: int, mesh: Mesh, axis: str = "sv"):
        self.n = n
        self.mesh = mesh
        self.axis = axis
        self.ndev = mesh.shape[axis]
        self.k = int(round(math.log2(self.ndev)))
        assert 2**self.k == self.ndev, "device count must be a power of two"
        assert n > self.k, "need at least one local qubit"
        self.nlocal = n - self.k
        self.local_size = 2**self.nlocal
        self.sharding = NamedSharding(mesh, P(axis))

    # -- helpers inside shard_map ---------------------------------------

    def _device_bit(self, q: int) -> Any:
        """This device's value of global (top) qubit q, as a traced scalar."""
        d = jax.lax.axis_index(self.axis)
        return (d >> (self.k - 1 - q)) & 1

    def _pairs(self, q: int):
        mask = 1 << (self.k - 1 - q)
        return [(d, d ^ mask) for d in range(self.ndev)]

    def _swap_top_local(self, local: Tensor, q_top: int, q_local: int) -> Tensor:
        """SWAP global top qubit ``q_top`` with local qubit ``q_local``."""
        b = self._device_bit(q_top)
        lq = q_local - self.k  # bit position within the local register
        left = 2**lq
        right = self.local_size // (2 * left)
        v = jnp.reshape(local, (left, 2, right))
        lo = v[:, 0]
        hi = v[:, 1]
        keep = jnp.where(b == 0, lo, hi)  # local slice with bit == device bit
        send = jnp.where(b == 0, hi, lo)
        recv = jax.lax.ppermute(send, self.axis, self._pairs(q_top))
        new0 = jnp.where(b == 0, keep, recv)
        new1 = jnp.where(b == 0, recv, keep)
        return jnp.reshape(jnp.stack([new0, new1], axis=1), (-1,))

    def _apply_local(self, local: Tensor, g: Tensor, wires: Sequence[int]) -> Tensor:
        return statevec.apply_unitary(
            local, g, [w - self.k for w in wires], 2
        )

    def _apply_in_map(self, local: Tensor, g: Tensor, wires: Sequence[int]) -> Tensor:
        wires = [int(w) for w in wires]
        top = [w for w in wires if w < self.k]
        if not top:
            return self._apply_local(local, g, wires)
        # universal fallback: swap each top qubit with a free local qubit
        used = set(wires)
        free = [w for w in range(self.k, self.n) if w not in used]
        assert len(free) >= len(top), "not enough local qubits to stage the gate"
        swaps = list(zip(top, free))
        for qt, ql in swaps:
            local = self._swap_top_local(local, qt, ql)
        eff = [dict(swaps)[w] if w in dict(swaps) else w for w in wires]
        local = self._apply_local(local, g, eff)
        for qt, ql in reversed(swaps):
            local = self._swap_top_local(local, qt, ql)
        return local

    # -- public functional API (call inside jit) ------------------------

    def init_zero(self) -> Tensor:
        """|0...0> sharded over the mesh."""
        def make(idx):
            local = jnp.zeros((self.local_size,), jnp.complex64)
            return local.at[0].set(jnp.where(idx == 0, 1.0 + 0.0j, 0.0 + 0.0j))

        @partial(
            jax.shard_map, mesh=self.mesh, in_specs=(), out_specs=P(self.axis),
            check_vma=False,
        )
        def build():
            return make(jax.lax.axis_index(self.axis))

        return build()

    def _shard_apply(self, f, psi: Tensor, *args: Any) -> Tensor:
        sm = jax.shard_map(
            f,
            mesh=self.mesh,
            in_specs=(P(self.axis),),
            out_specs=P(self.axis),
            check_vma=False,
        )
        return sm(psi)

    def apply(self, psi: Tensor, g: Tensor, wires: Sequence[int]) -> Tensor:
        """Apply a k-local unitary on ``wires`` (top or local)."""
        g = _as_local_gate(g)

        def f(local):
            return self._apply_in_map(local, g, wires)

        return self._shard_apply(f, psi)

    def h(self, psi: Tensor, q: int) -> Tensor:
        m = np.array([[1, 1], [1, -1]], np.complex64) / np.sqrt(2.0)
        return self.apply(psi, m, [q])

    def expectation_z(self, psi: Tensor, wires: Sequence[int]) -> Tensor:
        """<Z_{w1} Z_{w2} ...> — diagonal, no communication beyond one psum."""
        wires = [int(w) for w in wires]

        def f(local):
            d = jax.lax.axis_index(self.axis)
            sign = jnp.ones((), jnp.float32)
            prob = jnp.abs(local) ** 2
            idx = jnp.arange(self.local_size)
            par = jnp.zeros_like(idx)
            for w in wires:
                if w < self.k:
                    sign = sign * (
                        1.0 - 2.0 * ((d >> (self.k - 1 - w)) & 1).astype(jnp.float32)
                    )
                else:
                    par = par ^ ((idx >> (self.n - 1 - w)) & 1)
            z = 1.0 - 2.0 * par.astype(jnp.float32)
            val = sign * jnp.sum(prob * z)
            return jax.lax.psum(val[None], self.axis)

        sm = jax.shard_map(
            f, mesh=self.mesh, in_specs=(P(self.axis),), out_specs=P(self.axis),
            check_vma=False,
        )
        return sm(psi)[0]

    def expectation(self, psi: Tensor, ops: Sequence[Tuple[Any, Sequence[int]]]) -> Tensor:
        """<psi| O_1 O_2 ... |psi> for k-local unitary ops."""
        ops = [(_as_local_gate(o), [int(w) for w in wires]) for o, wires in ops]

        def f(local):
            phi = local
            for o, wires in ops:
                phi = self._apply_in_map(phi, o, wires)
            val = jnp.vdot(local, phi)
            return jax.lax.psum(jnp.real(val)[None], self.axis), jax.lax.psum(
                jnp.imag(val)[None], self.axis
            )

        sm = jax.shard_map(
            f,
            mesh=self.mesh,
            in_specs=(P(self.axis),),
            out_specs=(P(self.axis), P(self.axis)),
            check_vma=False,
        )
        re, im = sm(psi)
        return re[0] + 1j * im[0]

    def norm_sq(self, psi: Tensor) -> Tensor:
        def f(local):
            return jax.lax.psum(jnp.sum(jnp.abs(local) ** 2)[None], self.axis)

        sm = jax.shard_map(
            f, mesh=self.mesh, in_specs=(P(self.axis),), out_specs=P(self.axis),
            check_vma=False,
        )
        return sm(psi)[0]

    def gather(self, psi: Tensor) -> Tensor:
        """Full dense state on every device (testing only — defeats sharding)."""
        def f(local):
            return jax.lax.all_gather(local, self.axis, tiled=True)[None]

        sm = jax.shard_map(
            f, mesh=self.mesh, in_specs=(P(self.axis),), out_specs=P(self.axis),
            check_vma=False,
        )
        return sm(psi)[0]

    # ==================================================================
    # first-class engine surface (drives tc.Circuit(n, mesh=...))
    # ==================================================================
    #
    # MEMORY MODEL: the (2^n,) complex64 state is the ONLY 2^n object and
    # each device holds exactly its 2^{n-k} chunk (8·2^{n-k} bytes plus one
    # transient of the same size during a butterfly/swap).  v5e (16 GB HBM):
    # one chip tops out at n≈30; a 2^k-chip mesh adds k qubits (n≈34 on a
    # 16-chip pod, ICI-only collectives).  Per LAYER communication:
    # diagonal ops (zz/multicz/rzm) on ANY wires are communication-FREE
    # (device-bit sign arithmetic); a 1q mixer on a top wire is ONE paired
    # ppermute of the full chunk; a generic k-local gate with t top wires
    # costs 2t swap-ppermutes.  Expectations of Z-strings are one psum;
    # generic ops ride the gate path + one psum.

    def _cdtype(self) -> Any:
        from .. import config

        return jnp.dtype(config.dtypestr())

    def _rdtype(self) -> Any:
        from .. import config

        return jnp.dtype(config.rdtypestr())

    def uniform(self) -> Tensor:
        """|+...+> sharded (the h_fold constant, see basecircuit.py:108)."""
        amp = 1.0 / math.sqrt(2.0**self.n)

        @partial(
            jax.shard_map, mesh=self.mesh, in_specs=(), out_specs=P(self.axis),
            check_vma=False,
        )
        def build():
            return jnp.full((self.local_size,), amp, self._rdtype()).astype(
                self._cdtype()
            )

        return build()

    def shard_input(self, inputs: Tensor) -> Tensor:
        """Adopt a user-provided full state as a sharded array."""
        psi = jnp.reshape(jnp.asarray(inputs), (-1,)).astype(self._cdtype())
        import jax.core as _core

        if isinstance(psi, _core.Tracer):
            return jax.lax.with_sharding_constraint(psi, self.sharding)
        return jax.device_put(psi, self.sharding)

    # -- in-map building blocks (device-bit arithmetic, no communication) --

    def _sign_of_wire(self, w: int, idx: Tensor, rdt: Any) -> Tensor:
        """±1 of wire ``w`` per local element (scalar for top wires)."""
        if w < self.k:
            b = self._device_bit(w)
            return 1.0 - 2.0 * b.astype(rdt)
        bit = (idx >> (self.nlocal - 1 - (w - self.k))) & 1
        return 1.0 - 2.0 * bit.astype(rdt)

    def _zz_phases_in_map(
        self, local: Tensor, pairs: Sequence[Tuple[int, int]], thetas: Tensor
    ) -> Tensor:
        """exp(-i/2 Σ θ s_a s_b) for ANY pairs — communication-free."""
        rdt = self._rdtype()
        idx = jnp.arange(self.local_size)
        expo = jnp.zeros((), rdt)
        for j, (a, b) in enumerate(pairs):
            s = self._sign_of_wire(int(a), idx, rdt) * self._sign_of_wire(
                int(b), idx, rdt
            )
            expo = expo + thetas[j].astype(rdt) * s
        phase = jnp.cos(0.5 * expo) - 1j * jnp.sin(0.5 * expo)
        return local * jnp.broadcast_to(phase, local.shape).astype(local.dtype)

    def _gate1_top_in_map(self, local: Tensor, q: int, g: Tensor) -> Tensor:
        """Any 1q gate on top wire ``q``: ONE paired ppermute butterfly."""
        b = self._device_bit(q)
        recv = jax.lax.ppermute(local, self.axis, self._pairs(q))
        g = jnp.reshape(jnp.asarray(g), (2, 2)).astype(local.dtype)
        return g[b, b] * local + g[b, 1 - b] * recv

    def _diag_in_map(self, local: Tensor, diag: Tensor, wires: Sequence[int]) -> Tensor:
        """k-local diagonal on any wires: slice top axes by device bit."""
        wires = [int(w) for w in wires]
        t = diag if hasattr(diag, "ndim") else np.asarray(diag)
        t = jnp.reshape(jnp.asarray(t), (2,) * len(wires))
        keep: list = []
        for pos, w in enumerate(wires):
            if w < self.k:
                t = jnp.take(t, self._device_bit(w), axis=len(keep))
            else:
                keep.append(w - self.k)
        if not keep:
            return local * jnp.broadcast_to(t, local.shape).astype(local.dtype)
        return statevec.apply_diagonal(local, jnp.reshape(t, (-1,)), keep, 2)

    # -- sharded layer ops (one shard_map each; fuse under an outer jit) --

    def rzz_product(self, psi: Tensor, pairs: Any, thetas: Tensor) -> Tensor:
        thetas = jnp.reshape(jnp.asarray(thetas), (-1,))
        pairs = [(int(a), int(b)) for a, b in pairs]
        return self._shard_apply(
            lambda local: self._zz_phases_in_map(local, pairs, thetas), psi
        )

    def rx_layer(self, psi: Tensor, thetas: Tensor) -> Tensor:
        """rx on every qubit: local wires fused, top wires butterflied."""
        from ..core import kernels
        from ..ops.gates import rx_matrix

        thetas = jnp.reshape(jnp.asarray(thetas), (-1,))

        def f(local):
            local = kernels.fused_rx_layer(local, thetas[self.k :])
            for q in range(self.k):
                local = self._gate1_top_in_map(local, q, rx_matrix(thetas[q]))
            return local

        return self._shard_apply(f, psi)

    def gate_layer_1q(self, psi: Tensor, gates: Tensor, constant: bool = False) -> Tensor:
        """gates[q] on every qubit q (the fused_1q_layer item)."""
        from ..core import kernels

        def f(local):
            local = kernels.fused_single_qubit_layer(
                local, gates[self.k :], constant=constant
            )
            for q in range(self.k):
                local = self._gate1_top_in_map(local, q, gates[q])
            return local

        return self._shard_apply(f, psi)

    def zzrx_layer(
        self, psi: Tensor, pairs: Any, zz_thetas: Tensor, rx_thetas: Tensor
    ) -> Tensor:
        """Fused TFIM layer on the sharded state.

        ALL zz phases are communication-free (diagonal); pairs fully inside
        the local register ride the production Pallas kernel
        (``kernels.fused_zzrx_layer``) together with the local-wire rx;
        each top-wire rx is one paired ppermute.  Per layer the wire cost
        is exactly k butterflies regardless of circuit width.
        """
        from ..core import kernels
        from ..ops.gates import rx_matrix

        zz_thetas = jnp.reshape(jnp.asarray(zz_thetas), (-1,))
        rx_thetas = jnp.reshape(jnp.asarray(rx_thetas), (-1,))
        pairs = [(int(a), int(b)) for a, b in pairs]
        local_ids = [
            j for j, (a, b) in enumerate(pairs) if a >= self.k and b >= self.k
        ]
        cross_ids = [j for j in range(len(pairs)) if j not in local_ids]

        def f(local):
            if cross_ids:
                local = self._zz_phases_in_map(
                    local,
                    [pairs[j] for j in cross_ids],
                    jnp.stack([zz_thetas[j] for j in cross_ids]),
                )
            if local_ids:
                local = kernels.fused_zzrx_layer(
                    local,
                    [(pairs[j][0] - self.k, pairs[j][1] - self.k) for j in local_ids],
                    jnp.stack([zz_thetas[j] for j in local_ids]),
                    rx_thetas[self.k :],
                )
            else:
                local = kernels.fused_rx_layer(local, rx_thetas[self.k :])
            for q in range(self.k):
                local = self._gate1_top_in_map(local, q, rx_matrix(rx_thetas[q]))
            return local

        return self._shard_apply(f, psi)

    # -- QIR replay: the Circuit(mesh=...) execution backend ---------------

    def apply_item(self, psi: Tensor, item: dict) -> Tensor:
        """One QIR item on the sharded state (mirror of
        ``basecircuit._apply_item``)."""
        if item.get("rx_layer"):
            return self.rx_layer(psi, item["thetas"])
        if item.get("fused_1q_layer"):
            return self.gate_layer_1q(
                psi, jnp.asarray(item["gates"]), constant=bool(item.get("constant"))
            )
        if item.get("zz_product"):
            return self.rzz_product(psi, item["pairs"], item["thetas"])
        if item.get("zzrx_layer"):
            return self.zzrx_layer(
                psi, item["pairs"], item["zz_thetas"], item["rx_thetas"]
            )
        if item.get("multicz"):
            kq = len(item["index"])
            diag = np.ones(2**kq, np.float32)
            diag[-1] = -1.0
            return self._shard_apply(
                lambda local: self._diag_in_map(local, diag, item["index"]), psi
            )
        if item.get("zstring_rot"):
            from ..ops.gates import rzm_diagonal

            diag = rzm_diagonal(item["theta"], len(item["index"]), self._cdtype())
            return self._shard_apply(
                lambda local: self._diag_in_map(local, diag, item["index"]), psi
            )
        if item.get("diagonal"):
            kq = len(item["index"])
            dim = 2**kq
            diag = jnp.diagonal(jnp.reshape(item["gate"].tensor, (dim, dim)))
            return self._shard_apply(
                lambda local: self._diag_in_map(local, diag, item["index"]), psi
            )
        return self.apply(psi, item["gate"].tensor, item["index"])

    def run_groups(self, groups: Sequence[Any], inputs: Optional[Tensor] = None) -> Tensor:
        """Execute grouped QIR (``basecircuit._grouped_qir``) shard-wise."""
        psi = None
        if inputs is None and groups and isinstance(groups[0], dict) and groups[0].get("h_fold"):
            psi = self.uniform()
            groups = groups[1:]
        elif inputs is not None:
            psi = self.shard_input(inputs)
        if psi is None:
            psi = self.init_zero()
        for group in groups:
            if isinstance(group, list):
                for it in group:
                    psi = self.zzrx_layer(
                        psi, it["pairs"], it["zz_thetas"], it["rx_thetas"]
                    )
            else:
                psi = self.apply_item(psi, group)
        return psi

    # -- measurement / sampling -------------------------------------------

    _MEASURE_EPS = 0.31415926e-12

    def measure_jit(
        self,
        psi: Tensor,
        index: Sequence[int],
        status: Optional[Tensor] = None,
        with_prob: bool = False,
    ) -> Tuple[Tensor, Tensor]:
        """Autoregressive projective measurement, ONE shard_map program.

        Per qubit: the one-bit marginal is a per-shard reduction + psum
        (status-driven inverse CDF, identical convention to the dense
        engine), collapse is a local mask + global renorm — no state
        gather at any width.
        """
        index = [int(q) for q in index]
        if status is None:
            status = jax.random.uniform(jax.random.key(0), (len(index),))
        status = jnp.reshape(jnp.asarray(status), (-1,))
        rdt = self._rdtype()

        def f(local):
            d_idx = jax.lax.axis_index(self.axis)
            outs = []
            prob = jnp.ones((), rdt)
            for step, q in enumerate(index):
                mass = jnp.abs(local) ** 2
                if q < self.k:
                    b = self._device_bit(q).astype(rdt)
                    m1 = jax.lax.psum(jnp.sum(mass) * b, self.axis)
                    tot = jax.lax.psum(jnp.sum(mass), self.axis)
                else:
                    lq = q - self.k
                    left = 2**lq
                    right = self.local_size // (2 * left)
                    v = jnp.reshape(mass, (left, 2, right))
                    m1 = jax.lax.psum(jnp.sum(v[:, 1]), self.axis)
                    tot = jax.lax.psum(jnp.sum(mass), self.axis)
                p1 = m1 / tot
                cdf = jnp.stack([1.0 - p1, jnp.ones((), rdt)])
                r = status[step].astype(rdt)
                outcome = jnp.clip(
                    jnp.searchsorted(cdf, r + self._MEASURE_EPS, side="left"), 0, 1
                )
                p_out = jnp.where(outcome == 1, p1, 1.0 - p1)
                prob = prob * p_out
                if q < self.k:
                    keep = (self._device_bit(q) == outcome).astype(rdt)
                    local = local * keep.astype(local.dtype)
                else:
                    lq = q - self.k
                    left = 2**lq
                    right = self.local_size // (2 * left)
                    sel = jax.nn.one_hot(outcome, 2, dtype=rdt)
                    v = jnp.reshape(local, (left, 2, right))
                    local = jnp.reshape(
                        v * sel[None, :, None].astype(local.dtype), (-1,)
                    )
                local = local / jnp.sqrt(
                    jnp.maximum(p_out * tot, 1e-30)
                ).astype(local.dtype)
                outs.append(outcome)
            sample = jnp.stack(outs).astype(jnp.int32)
            return sample[None], prob[None]

        sm = jax.shard_map(
            f,
            mesh=self.mesh,
            in_specs=(P(self.axis),),
            out_specs=(P(self.axis), P(self.axis)),
            check_vma=False,
        )
        samples, probs = sm(psi)
        if with_prob:
            return samples[0], probs[0]
        return samples[0], jnp.asarray(-1.0)

    def amplitude(self, psi: Tensor, bits: Any) -> Tensor:
        """⟨bits|ψ⟩ — the owning device contributes one element, one psum.

        ``bits``: bitstring ("0101…") or sequence of 0/1, length n, wire 0
        first (same convention as the dense engine's ``amplitude``).
        """
        if isinstance(bits, str):
            bits = [int(b) for b in bits]
        bits = [int(b) for b in bits]
        assert len(bits) == self.n
        d_target = 0
        for w in range(self.k):
            d_target = 2 * d_target + bits[w]
        li = 0
        for w in range(self.k, self.n):
            li = 2 * li + bits[w]

        def f(local):
            d = jax.lax.axis_index(self.axis)
            hit = (d == d_target).astype(local.dtype)
            v = local[li] * hit
            return (
                jax.lax.psum(jnp.real(v)[None], self.axis),
                jax.lax.psum(jnp.imag(v)[None], self.axis),
            )

        sm = jax.shard_map(
            f,
            mesh=self.mesh,
            in_specs=(P(self.axis),),
            out_specs=(P(self.axis), P(self.axis)),
            check_vma=False,
        )
        re, im = sm(psi)
        return re[0] + 1j * im[0]

    def probability(self, psi: Tensor, wires: Optional[Sequence[int]] = None) -> Tensor:
        """Marginal Born distribution over ``wires`` (default: all), shape
        ``(2^m,)`` in the wire order given.

        Communication-free except ONE psum: local-wire marginals are
        segment-split reshaped sums (never a rank-n ``(2,)*n`` tensor — axes
        are split only at requested wires), top wires contribute a one-hot
        of the device bit.
        """
        wires = list(range(self.n)) if wires is None else [int(w) for w in wires]
        assert len(set(wires)) == len(wires)
        m = len(wires)
        rdt = self._rdtype()
        loc_sorted = sorted(w for w in wires if w >= self.k)

        def f(local):
            mass = jnp.real(local) ** 2 + jnp.imag(local) ** 2
            # split the flat local axis ONLY at requested wires:
            # (seg0, 2, seg1, 2, ..., seglast) then sum out the segments
            shape: list = []
            prev = -1
            for w in loc_sorted:
                ax = w - self.k
                shape.append(2 ** (ax - prev - 1))
                shape.append(2)
                prev = ax
            shape.append(2 ** (self.nlocal - 1 - prev))
            pm = jnp.sum(
                jnp.reshape(mass, shape), axis=tuple(range(0, 2 * len(loc_sorted) + 1, 2))
            )  # (2,)*len(loc_sorted), ascending wire order
            # reorder local axes to the requested relative order
            req_loc = [w for w in wires if w >= self.k]
            pm = jnp.transpose(pm, [loc_sorted.index(w) for w in req_loc])
            # interleave top wires as one-hot device-bit factors
            out = pm
            for p, w in enumerate(wires):
                if w < self.k:
                    oh = jax.nn.one_hot(self._device_bit(w), 2, dtype=rdt)
                    out = jnp.expand_dims(out, p) * jnp.reshape(
                        oh, (1,) * p + (2,) + (1,) * (out.ndim - p)
                    )
            return jax.lax.psum(jnp.reshape(out, (2**m,))[None], self.axis)

        sm = jax.shard_map(
            f, mesh=self.mesh, in_specs=(P(self.axis),), out_specs=P(self.axis),
            check_vma=False,
        )
        return sm(psi)[0]

    def sample_direct(self, psi: Tensor, status: Tensor) -> Tensor:
        """Batched Born sampling: ALL shots in one pass, two collectives.

        Per-shard inverse CDF: every device computes its local cumulative
        mass, learns its exclusive prefix over the mesh (one all_gather of
        scalars), maps each uniform r into its local interval, and the
        single in-range device contributes ``global_index`` to one psum —
        collective count is independent of the shot count (contrast the
        autoregressive chain: 3 psums per measured qubit per shot).
        Returns int32 global indices of shape ``status.shape``.
        """
        status = jnp.reshape(jnp.asarray(status), (-1,))
        if self.n > 31 and not jax.config.jax_enable_x64:
            # jnp.int64 silently downcasts to int32 without x64 — exactly the
            # width where global indices no longer fit; fail loudly instead
            raise ValueError(
                "sample_direct needs int64 global indices for n > 31: enable "
                "jax_enable_x64, or use measure_jit (per-qubit bits, no wide "
                "integer index)"
            )

        def f(local):
            mass = jnp.real(local) ** 2 + jnp.imag(local) ** 2
            csum = jnp.cumsum(mass)
            mine = csum[-1]
            d = jax.lax.axis_index(self.axis)
            all_m = jax.lax.all_gather(mine, self.axis)  # (ndev,)
            before = jnp.sum(jnp.where(jnp.arange(self.ndev) < d, all_m, 0.0))
            tot = jnp.sum(all_m)
            r = status.astype(mass.dtype) * tot * (1.0 - 1e-7)
            x = r - before
            in_range = (x >= 0) & (x < mine)
            li = jnp.clip(
                jnp.searchsorted(csum, x, side="right"), 0, self.local_size - 1
            )
            gidx = (d * self.local_size + li).astype(jnp.int64 if self.n > 31 else jnp.int32)
            contrib = jnp.where(in_range, gidx, 0)
            return jax.lax.psum(contrib, self.axis)[None]

        sm = jax.shard_map(
            f, mesh=self.mesh, in_specs=(P(self.axis),), out_specs=P(self.axis),
            check_vma=False,
        )
        return sm(psi)[0]

    def unitary_kraus(
        self,
        psi: Tensor,
        kraus: Sequence[Any],
        wires: Sequence[int],
        status: Tensor,
        prob: Optional[Sequence[float]] = None,
    ) -> Tuple[Tensor, Tensor]:
        """Status-driven unitary-Kraus Monte-Carlo on the sharded state.

        Dense-engine semantics (``models/circuit.py:100``, reference
        ``circuit.py:404-510``): branch probabilities are tr(K†K)/dim (or
        ``prob``), the branch is picked by cumulative-sum arithmetic on the
        uniform ``status`` (jit/vmap-safe, no data-dependent control flow),
        and the SELECTED renormalized operator is applied as one k-local
        gate inside the existing shard_map apply path — the branch blend
        ``Σ_i 1[idx==i] K_i`` happens in gate space (k-local, tiny), so the
        trajectory costs exactly one sharded gate application.

        Returns ``(new_psi, branch_index)``.
        """
        mats = [_as_local_gate(k) for k in kraus]
        dim = int(mats[0].shape[0])
        status = jnp.asarray(status).astype(self._rdtype())
        traced = any(isinstance(m, jax.core.Tracer) for m in mats)
        if not traced:
            # concrete channel: stay NUMPY host-side (axon complex rule —
            # eager jnp on complex constants would device-put and later
            # fetch; see CLAUDE.md), probabilities fold to constants
            mats = [np.asarray(m).reshape(dim, dim) for m in mats]
            if prob is None:
                ps = np.array([np.real(np.trace(m.conj().T @ m)) / dim for m in mats])
                mats = [m / np.sqrt(max(p, 1e-30)) for m, p in zip(mats, ps)]
            else:
                ps = np.asarray(prob, dtype=np.float64)
            ps = ps / np.sum(ps)
            cum = jnp.asarray(np.cumsum(ps), dtype=status.dtype)
        else:
            # traced kraus (trainable noise): keep everything in the trace
            # — dense-engine parity (models/circuit.py:100)
            mats = [jnp.reshape(jnp.asarray(m, self._cdtype()), (dim, dim)) for m in mats]
            if prob is None:
                ps = jnp.stack(
                    [jnp.real(jnp.trace(jnp.conj(m.T) @ m)) / dim for m in mats]
                ).astype(self._rdtype())
                mats = [
                    m / jnp.sqrt(jnp.maximum(p, 1e-30)).astype(self._cdtype())
                    for m, p in zip(mats, ps)
                ]
            else:
                ps = jnp.asarray(prob).astype(self._rdtype())
            ps = ps / jnp.sum(ps)
            cum = jnp.cumsum(ps).astype(status.dtype)
        idx = jnp.sum((status >= cum[:-1]).astype(jnp.int32))
        onehot = (jnp.arange(len(mats)) == idx).astype(self._rdtype())
        # blended k-local gate: numpy complex constants lift into the trace
        m_sel = sum(onehot[i] * jnp.asarray(mats[i], dtype=self._cdtype()) for i in range(len(mats)))
        return self.apply(psi, m_sel, wires), idx

    def expectation_ising_sum(self, psi: Tensor, spec: Any) -> Tensor:
        """⟨Σ w_s Π Z + Σ w_q X_q⟩ in ONE shard_map pass + one psum.

        Z-strings of any locality are communication-free (local-bit index
        arithmetic × top-wire device-bit signs on |ψ|²); each DISTINCT top
        wire carrying an X field costs one paired ppermute; local X fields
        are slot-flipped overlaps.  ``spec`` is the hashable output of
        ``kernels.ising_readout_spec``.
        """
        diag_terms, x_terms = spec
        rdt = self._rdtype()

        def f(local):
            idx = jnp.arange(self.local_size)
            mass = jnp.real(local) ** 2 + jnp.imag(local) ** 2
            e = jnp.zeros((), rdt)
            for qubits, w in diag_terms:
                s = jnp.ones((), rdt)
                for q in qubits:
                    s = s * self._sign_of_wire(int(q), idx, rdt)
                e = e + w * jnp.sum(mass * s)
            recv_cache = {}
            for q, w in x_terms:
                q = int(q)
                if q < self.k:
                    if q not in recv_cache:
                        recv_cache[q] = jax.lax.ppermute(
                            local, self.axis, self._pairs(q)
                        )
                    r = recv_cache[q]
                    e = e + w * jnp.sum(
                        jnp.real(local) * jnp.real(r) + jnp.imag(local) * jnp.imag(r)
                    )
                else:
                    lq = q - self.k
                    left = 2**lq
                    right = self.local_size // (2 * left)
                    v = jnp.reshape(local, (left, 2, right))
                    e = e + 2.0 * w * jnp.sum(
                        jnp.real(v[:, 0]) * jnp.real(v[:, 1])
                        + jnp.imag(v[:, 0]) * jnp.imag(v[:, 1])
                    )
            return jax.lax.psum(e[None], self.axis)

        sm = jax.shard_map(
            f, mesh=self.mesh, in_specs=(P(self.axis),), out_specs=P(self.axis),
            check_vma=False,
        )
        return sm(psi)[0]

    def expectation_ps(
        self,
        psi: Tensor,
        x: Optional[Sequence[int]] = None,
        y: Optional[Sequence[int]] = None,
        z: Optional[Sequence[int]] = None,
    ) -> Tensor:
        """⟨Π X_i Π Y_j Π Z_k⟩ as ONE flip-overlap: at most one ppermute
        (all top X/Y wires share a single XOR exchange) + one psum.

        (Pψ)_b = ψ_{b⊕F} · (−i)^{|y|} Π_{j∈y} s_j(b) Π_{k∈z} s_k(b) with
        F the X∪Y flip mask and s the ±1 bit signs — so the expectation is
        a phase-weighted overlap of ψ with its F-flipped self, never a
        densified gate chain (reference role: ``expectation_ps``; here the
        sharded analog of the ising-readout slot-flip trick).
        """
        xw = [int(w) for w in (x or ())]
        yw = [int(w) for w in (y or ())]
        zw = [int(w) for w in (z or ())]
        assert len(set(xw + yw + zw)) == len(xw + yw + zw)
        if not xw and not yw:
            return self.expectation_z(psi, zw).astype(self._cdtype())
        flips = sorted(xw + yw)
        top_mask = 0
        for w in flips:
            if w < self.k:
                top_mask |= 1 << (self.k - 1 - w)
        loc_flips = [w for w in flips if w >= self.k]
        # (−i)^{|y|}: constant complex prefactor, applied on the host side
        pref = (-1j) ** (len(yw) % 4)
        rdt = self._rdtype()

        def f(local):
            idx = jnp.arange(self.local_size)
            phi = local
            for w in loc_flips:  # local bit flip = axis reversal, one pass
                lq = w - self.k
                left = 2**lq
                right = self.local_size // (2 * left)
                phi = jnp.reshape(
                    jnp.reshape(phi, (left, 2, right))[:, ::-1], (-1,)
                )
            if top_mask:
                pairs = [(d, d ^ top_mask) for d in range(self.ndev)]
                phi = jax.lax.ppermute(phi, self.axis, pairs)
            sign = jnp.ones((), rdt)
            for w in yw + zw:  # phase rides the OUTPUT index bits
                s = self._sign_of_wire(int(w), idx, rdt)
                sign = sign * s
            v = jnp.sum(jnp.conj(local) * phi * sign.astype(local.dtype))
            return (
                jax.lax.psum(jnp.real(v)[None], self.axis),
                jax.lax.psum(jnp.imag(v)[None], self.axis),
            )

        sm = jax.shard_map(
            f,
            mesh=self.mesh,
            in_specs=(P(self.axis),),
            out_specs=(P(self.axis), P(self.axis)),
            check_vma=False,
        )
        re, im = sm(psi)
        return pref * (re[0] + 1j * im[0])
