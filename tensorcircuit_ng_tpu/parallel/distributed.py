"""``DistributedContractor``: sliced tensor contraction over a device mesh.

Counterpart of reference ``experimental.py:760-1249``: the contraction path
and slice set are found host-side (process 0) and broadcast; slice ids are
padded to ``devices x slices_per_device`` and sharded
``NamedSharding(mesh, P("devices", None))``; each device ``lax.scan``s its
slice subset; the cross-device sum lowers to one XLA AllReduce over ICI.
API parity: ``value``, ``value_and_grad``, ``find_path``/``from_path``
checkpointing (reference A.7 contract).
"""

from __future__ import annotations

import pickle
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.einsum_ir import EinsumIR
from ..core import contractor as _ctr

Tensor = Any

__all__ = ["DistributedContractor"]


class DistributedContractor:
    """Distribute a sliced einsum contraction over a JAX device mesh.

    ``ir_fn(params) -> EinsumIR`` plays the role of the reference's
    ``nodes_fn`` (params may be any pytree).  ``options`` supports
    ``target_size`` (max intermediate elements per slice, default 2**28) and
    ``optimizer`` (opt_einsum path optimizer).
    """

    def __init__(
        self,
        ir_fn: Callable[..., EinsumIR],
        params: Any,
        options: Optional[Dict[str, Any]] = None,
        devices: Optional[Sequence[Any]] = None,
        mesh: Optional[Mesh] = None,
        tree_data: Optional[Dict[str, Any]] = None,
    ) -> None:
        self._ir_fn = ir_fn
        options = options or {}
        self._optimizer = options.get("optimizer", "greedy")
        target_size = options.get("target_size", 2**28)

        if mesh is None:
            devs = list(devices) if devices is not None else jax.devices()
            mesh = Mesh(np.array(devs), ("devices",))
        self._mesh = mesh
        self._ndev = int(np.prod(mesh.devices.shape))

        if tree_data is None:
            tree_data = self._search(params, target_size)
        self._tree_data = tree_data
        self._sliced: List[int] = list(tree_data["sliced_indices"])
        self._nslices = int(tree_data["num_slices"])
        self._compiled: Dict[Any, Callable] = {}
        self._prepare_slices()

    # ------------------------------------------------------------------

    def _search(self, params: Any, target_size: int) -> Dict[str, Any]:
        """Slice search on process 0, broadcast to all (reference ``:836-877``)."""
        from ..experimental import broadcast_py_object

        if jax.process_index() == 0:
            ir = self._ir_fn(params)
            sliced = _ctr.choose_slices(
                ir, target_size=target_size, optimizer=self._optimizer
            )
            num = int(np.prod([ir.size_dict[i] for i in sliced])) if sliced else 1
            data = {
                "sliced_indices": sliced,
                "num_slices": num,
                "inputs": ir.inputs,
                "output": ir.output,
                "size_dict": ir.size_dict,
            }
        else:
            data = None
        return broadcast_py_object(data)

    def _prepare_slices(self) -> None:
        per_dev = -(-self._nslices // self._ndev)  # ceil
        total = per_dev * self._ndev
        ids = np.arange(total) % self._nslices  # padded ids wrap (masked below)
        mask = (np.arange(total) < self._nslices).astype(np.float32)
        self._slice_ids = jnp.asarray(ids.reshape(self._ndev, per_dev), dtype=jnp.int32)
        self._slice_mask = jnp.asarray(mask.reshape(self._ndev, per_dev))
        self._id_sharding = NamedSharding(self._mesh, P("devices", None))
        self._rep_sharding = NamedSharding(self._mesh, P())
        self._slice_ids = jax.device_put(self._slice_ids, self._id_sharding)
        self._slice_mask = jax.device_put(self._slice_mask, self._id_sharding)

    # ------------------------------------------------------------------

    def _get_or_compile(self, op: Optional[Callable], with_grad: bool) -> Callable:
        key = (id(op) if op is not None else None, with_grad)
        if key in self._compiled:
            return self._compiled[key]

        ir_fn = self._ir_fn
        sliced = self._sliced
        optimizer = self._optimizer

        def total(params: Any, slice_ids: Tensor, slice_mask: Tensor) -> Tensor:
            ir = ir_fn(params)

            def per_device(ids: Tensor, msk: Tensor) -> Tensor:
                return _ctr.sliced_contract_ir(
                    ir, sliced, ids, optimizer=optimizer, slice_weights=msk
                )

            parts = jax.vmap(per_device)(slice_ids, slice_mask)
            return jnp.sum(parts, axis=0)  # -> XLA AllReduce over devices

        if with_grad:

            def loss(params, slice_ids, slice_mask):
                v = total(params, slice_ids, slice_mask)
                if op is not None:
                    return jnp.real(op(v))
                return jnp.real(jnp.sum(v))

            fn = jax.jit(
                jax.value_and_grad(loss),
                in_shardings=(None, self._id_sharding, self._id_sharding),
                out_shardings=(self._rep_sharding, None),
            )
        else:

            def value_fn(params, slice_ids, slice_mask):
                v = total(params, slice_ids, slice_mask)
                if op is not None:
                    return op(v)
                return v

            fn = jax.jit(
                value_fn,
                in_shardings=(None, self._id_sharding, self._id_sharding),
                out_shardings=self._rep_sharding,
            )
        self._compiled[key] = fn
        return fn

    def value(self, params: Any, op: Optional[Callable] = None) -> Tensor:
        """Contract with current params; replicated result on every device."""
        fn = self._get_or_compile(op, with_grad=False)
        return fn(params, self._slice_ids, self._slice_mask)

    def value_and_grad(self, params: Any, op: Optional[Callable] = None) -> Tuple[Tensor, Any]:
        """(Re(value), grads) with pytree-structured grads (reference ``:1182``)."""
        fn = self._get_or_compile(op, with_grad=True)
        return fn(params, self._slice_ids, self._slice_mask)

    def grad(self, params: Any, op: Optional[Callable] = None) -> Any:
        return self.value_and_grad(params, op)[1]

    # ------------------------------------------------------------------
    # path checkpointing (reference experimental.py:956-991)
    # ------------------------------------------------------------------

    def find_path(self, filepath: str) -> None:
        """Pickle the slice/tree data so later runs skip the search."""
        with open(filepath, "wb") as f:
            pickle.dump(self._tree_data, f)

    @classmethod
    def from_path(
        cls,
        filepath: str,
        ir_fn: Callable[..., EinsumIR],
        params: Any = None,
        **kws: Any,
    ) -> "DistributedContractor":
        with open(filepath, "rb") as f:
            tree_data = pickle.load(f)
        return cls(ir_fn, params, tree_data=tree_data, **kws)

    def report(self) -> Dict[str, Any]:
        """Slices / sizes report (reference ``_report_tree_info`` ``:909``)."""
        return {
            "num_slices": self._nslices,
            "sliced_indices": self._sliced,
            "devices": self._ndev,
            "slices_per_device": int(self._slice_ids.shape[1]),
        }
