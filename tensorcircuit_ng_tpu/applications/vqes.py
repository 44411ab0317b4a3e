"""VQNHE: variational quantum-neural hybrid eigensolver.

Counterpart of reference ``applications/vqes.py`` (tf.keras models + graph
building, ``:212-676``), redesigned JAX-native: the neural post-processor is
a pure ``(params, bitstrings) -> log f`` function (MLP or RBM, real or
complex), the circuit is any parameterized ansatz over this framework's
``Circuit``, and the hybrid energy

    E = <psi_f| H |psi_f> / <psi_f|psi_f>,   psi_f(s) = f(s) * psi_theta(s)

is computed densely (small-n regime, same as the reference) and optimized
jointly with optax.  arXiv:2106.05105.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

Tensor = Any

__all__ = ["paulistring", "construct_matrix", "vqe_energy", "VQNHE"]


def paulistring(term: Sequence[int]) -> np.ndarray:
    """Dense matrix of one Pauli string given per-qubit codes (0..3)."""
    from ..quantum import PauliStringSum2Dense

    return PauliStringSum2Dense([list(term)], [1.0], numpy=True)


def construct_matrix(ham: List[List[float]]) -> np.ndarray:
    """Dense H from rows ``[weight, code_1, ..., code_n]`` (reference ``:55``)."""
    from ..quantum import PauliStringSum2Dense

    ls = [[int(x) for x in row[1:]] for row in ham]
    ws = [float(row[0]) for row in ham]
    return PauliStringSum2Dense(ls, ws, numpy=True)


construct_matrix_v2 = construct_matrix
construct_matrix_v3 = construct_matrix


def vqe_energy(c: Any, h: List[List[float]], reuse: bool = True) -> Tensor:
    """⟨ψ|H|ψ⟩ for a circuit and list-form Hamiltonian (reference ``:114``)."""
    hm = construct_matrix(h)
    psi = c.state()
    return jnp.real(jnp.vdot(psi, hm @ psi))


def vqe_energy_shortcut(c: Any, h: Tensor) -> Tensor:
    psi = c.state()
    return jnp.real(jnp.vdot(psi, jnp.asarray(h) @ psi))


def _all_bitstrings(n: int) -> np.ndarray:
    idx = np.arange(2**n)
    return ((idx[:, None] >> (n - 1 - np.arange(n))) & 1).astype(np.float32)


class VQNHE:
    """Joint circuit + neural-network wavefunction optimizer.

    :param n: qubit count
    :param hamiltonian: rows ``[w, code_1..code_n]`` (codes 0=I,1=X,2=Y,3=Z)
    :param model_type: "real" | "complex" | "rbm" | "complex-rbm"
    :param ansatz: "hea" (hardware-efficient rx/zz layers) or "hn"
        (Hadamard + neural only)
    :param nlayers: ansatz depth
    :param units: hidden width of the MLP models
    """

    def __init__(
        self,
        n: int,
        hamiltonian: List[List[float]],
        model_type: str = "real",
        ansatz: str = "hea",
        nlayers: int = 2,
        units: int = 16,
        seed: int = 42,
    ) -> None:
        self.n = n
        self.h = jnp.asarray(construct_matrix(hamiltonian))
        self.model_type = model_type
        self.ansatz = ansatz
        self.nlayers = nlayers
        self.units = units
        self.basis = jnp.asarray(_all_bitstrings(n))
        rng = np.random.default_rng(seed)
        self.circuit_params = jnp.asarray(
            rng.normal(size=self._cparam_shape()) * 0.1, dtype=jnp.float32
        )
        self.model_params = self._init_model(rng)

    # ------------------------------------------------------------- circuit

    def _cparam_shape(self) -> Tuple[int, ...]:
        return (self.nlayers, 2, self.n)

    def circuit_state(self, params: Tensor) -> Tensor:
        from ..models.circuit import Circuit

        c = Circuit(self.n)
        c.h_layer()
        if self.ansatz == "hn":
            return c.state()
        pairs = [(i, i + 1) for i in range(self.n - 1)]
        for l in range(self.nlayers):
            c.rzz_product(pairs, params[l, 0, : self.n - 1])
            c.rx_layer(params[l, 1])
        return c.state()

    # -------------------------------------------------------------- models

    def _init_model(self, rng: np.ndarray) -> Dict[str, Tensor]:
        u, n = self.units, self.n

        def mat(*shape):
            return jnp.asarray(rng.normal(size=shape) * 0.1, dtype=jnp.float32)

        if self.model_type in ("real", "complex"):
            p = {"w1": mat(n, u), "b1": mat(u), "w2": mat(u, 1), "b2": mat(1)}
            if self.model_type == "complex":
                p.update({"pw1": mat(n, u), "pb1": mat(u), "pw2": mat(u, 1), "pb2": mat(1)})
            return p
        if self.model_type in ("rbm", "complex-rbm"):
            p = {"a": mat(n), "b": mat(u), "w": mat(n, u)}
            if self.model_type == "complex-rbm":
                p.update({"pa": mat(n), "pb": mat(u), "pw": mat(n, u)})
            return p
        raise ValueError(f"unknown model_type {self.model_type!r}")

    def _log_f(self, p: Dict[str, Tensor], s: Tensor) -> Tensor:
        """log f(s) per basis state; complex for phase-carrying models."""
        if self.model_type in ("real", "complex"):
            h = jnp.tanh(s @ p["w1"] + p["b1"])
            logmod = (h @ p["w2"] + p["b2"])[:, 0]
            if self.model_type == "real":
                return logmod.astype(jnp.complex64)
            ph = jnp.tanh(s @ p["pw1"] + p["pb1"])
            phase = (ph @ p["pw2"] + p["pb2"])[:, 0]
            return logmod + 1j * phase.astype(jnp.complex64)
        # RBM: log f = a.s + sum log cosh(s W + b)
        logmod = s @ p["a"] + jnp.sum(jnp.log(jnp.cosh(s @ p["w"] + p["b"])), axis=-1)
        if self.model_type == "rbm":
            return logmod.astype(jnp.complex64)
        phase = s @ p["pa"] + jnp.sum(
            jnp.log(jnp.cosh(s @ p["pw"] + p["pb"])), axis=-1
        )
        return logmod + 1j * phase.astype(jnp.complex64)

    # -------------------------------------------------------------- energy

    def energy(self, cparams: Tensor, mparams: Dict[str, Tensor]) -> Tensor:
        psi = self.circuit_state(cparams)
        logf = self._log_f(mparams, self.basis)
        logf = logf - jnp.max(jnp.real(logf))  # overflow guard
        psi_f = psi * jnp.exp(logf).astype(psi.dtype)
        num = jnp.real(jnp.vdot(psi_f, self.h @ psi_f))
        den = jnp.real(jnp.vdot(psi_f, psi_f))
        return num / den

    def plain_energy(self, cparams: Optional[Tensor] = None) -> float:
        cparams = self.circuit_params if cparams is None else cparams
        psi = self.circuit_state(cparams)
        return float(jnp.real(jnp.vdot(psi, self.h @ psi)))

    # ------------------------------------------------------------ training

    def training(
        self,
        maxiter: int = 200,
        lr_circuit: float = 1e-2,
        lr_model: float = 5e-3,
        verbose: bool = False,
    ) -> Tuple[float, Tensor, Dict[str, Tensor]]:
        """Joint optimization; returns (best energy, circuit params, nn params)."""
        import optax

        optc = optax.adam(lr_circuit)
        optm = optax.adam(lr_model)
        sc = optc.init(self.circuit_params)
        sm = optm.init(self.model_params)

        @jax.jit
        def step(cp, mp, sc, sm):
            e, (gc, gm) = jax.value_and_grad(self.energy, argnums=(0, 1))(cp, mp)
            uc, sc = optc.update(gc, sc, cp)
            um, sm = optm.update(gm, sm, mp)
            return optax.apply_updates(cp, uc), optax.apply_updates(mp, um), sc, sm, e

        cp, mp = self.circuit_params, self.model_params
        best = float("inf")
        for it in range(maxiter):
            cp, mp, sc, sm, e = step(cp, mp, sc, sm)
            e = float(e)
            if e < best:
                best = e
                self.circuit_params, self.model_params = cp, mp
            if verbose and it % 50 == 0:
                print(f"iter {it}: E = {e:.6f}")
        return best, self.circuit_params, self.model_params

    multi_training = training  # reference API alias (single-process here)

    # ------------------------------------------------------ reference surface
    # (applications/vqes.py:72-676)

    def create_circuit(self, ansatz: Optional[str] = None, **kws: Any) -> Callable[[Tensor], Tensor]:
        """Return the ``params -> state`` function of the chosen ansatz (ref names
        create_circuit/create_hea_circuit/create_hn_circuit/create_hea2_circuit)."""
        if ansatz is not None:
            self.ansatz = ansatz
        return self.circuit_state

    def create_hea_circuit(self, **kws: Any) -> Callable[[Tensor], Tensor]:
        return self.create_circuit("hea", **kws)

    def create_hea2_circuit(self, **kws: Any) -> Callable[[Tensor], Tensor]:
        return self.create_circuit("hea", **kws)

    def create_hn_circuit(self, **kws: Any) -> Callable[[Tensor], Tensor]:
        return self.create_circuit("hn", **kws)

    def create_functional_circuit(self, fn: Callable[[Tensor], Tensor]) -> Callable[[Tensor], Tensor]:
        """Install a user ``params -> state`` function as the ansatz (ref name)."""
        self.circuit_state = fn  # type: ignore[assignment]
        return fn

    def create_model(self, model_type: Optional[str] = None, **kws: Any) -> Dict[str, Tensor]:
        """(Re)initialize the neural post-processor (reference create_*_model)."""
        if model_type is not None:
            self.model_type = model_type
        rng = np.random.default_rng(kws.pop("seed", 0))
        self.model_params = self._init_model(rng)
        return self.model_params

    def create_real_model(self, **kws: Any) -> Dict[str, Tensor]:
        return self.create_model("real", **kws)

    def create_complex_model(self, **kws: Any) -> Dict[str, Tensor]:
        return self.create_model("complex", **kws)

    def create_real_rbm_model(self, **kws: Any) -> Dict[str, Tensor]:
        return self.create_model("rbm", **kws)

    def create_complex_rbm_model(self, **kws: Any) -> Dict[str, Tensor]:
        return self.create_model("complex-rbm", **kws)

    def assign(self, cparams: Optional[Tensor] = None, mparams: Optional[Any] = None) -> None:
        """Overwrite current variational parameters (reference ``assign``)."""
        if cparams is not None:
            self.circuit_params = jnp.asarray(cparams)
        if mparams is not None:
            self.model_params = jax.tree_util.tree_map(jnp.asarray, mparams)

    def evaluation(self, cparams: Optional[Tensor] = None, mparams: Optional[Any] = None) -> Tuple[float, float]:
        """(hybrid energy, plain circuit energy) at given/current params."""
        cp = self.circuit_params if cparams is None else jnp.asarray(cparams)
        mp = self.model_params if mparams is None else mparams
        return float(self.energy(cp, mp)), self.plain_energy(cp)

    def plain_evaluation(self, cparams: Optional[Tensor] = None) -> float:
        return self.plain_energy(cparams)

    def save(self, path: str) -> None:
        """Pickle current parameters (reference ``save``)."""
        import pickle

        with open(path, "wb") as f:
            pickle.dump(
                {
                    "circuit_params": np.asarray(jax.device_get(self.circuit_params)),
                    "model_params": jax.tree_util.tree_map(
                        lambda x: np.asarray(jax.device_get(x)), self.model_params
                    ),
                    "model_type": self.model_type,
                    "ansatz": self.ansatz,
                },
                f,
            )

    def load(self, path: str) -> None:
        """Restore parameters from :meth:`save` output (reference ``load``)."""
        import pickle

        with open(path, "rb") as f:
            data = pickle.load(f)
        self.model_type = data["model_type"]
        self.ansatz = data["ansatz"]
        self.assign(data["circuit_params"], data["model_params"])

    recover = load  # reference alias


# ======================================================================
# reference-parity surface (applications/vqes.py:72-676)
# ======================================================================

construct_matrix_tf = construct_matrix  # reference TF-era alias


class Linear:
    """Complex-weight dense layer (reference ``vqes.py:139``), functional form.

    ``layer = Linear(units, input_dim); y = layer(params, x)`` with
    ``params = layer.init(rng)`` holding real and imaginary kernels.
    """

    def __init__(self, units: int, input_dim: int, stddev: float = 0.1):
        self.units = units
        self.input_dim = input_dim
        self.stddev = stddev

    def init(self, rng: Optional[np.random.Generator] = None) -> Dict[str, Tensor]:
        rng = rng or np.random.default_rng()
        shape = (self.input_dim, self.units)
        return {
            "wr": jnp.asarray(rng.normal(scale=self.stddev, size=shape), dtype=jnp.float32),
            "wi": jnp.asarray(rng.normal(scale=self.stddev, size=shape), dtype=jnp.float32),
            "br": jnp.zeros((self.units,), dtype=jnp.float32),
            "bi": jnp.zeros((self.units,), dtype=jnp.float32),
        }

    def __call__(self, params: Dict[str, Tensor], x: Tensor) -> Tensor:
        w = params["wr"] + 1j * params["wi"]
        b = params["br"] + 1j * params["bi"]
        return jnp.asarray(x, dtype=w.dtype) @ w + b

    call = __call__  # TF-era alias


def JointSchedule(
    steps: int = 300,
    lr_first: float = 1e-3,
    lr_second: float = 1e-2,
) -> Callable[[int], float]:
    """Two-stage learning-rate schedule (reference ``vqes.py:183``): lr_first
    before ``steps``, lr_second after — as an optax-compatible callable."""

    def schedule(count: Any) -> Any:
        return jnp.where(jnp.asarray(count) < steps, lr_first, lr_second)

    return schedule




