"""DQAS application kernels: value-and-gradient (vag) functions, JAX-native.

Counterpart of reference ``applications/vags.py`` (TF-based; its tfq/cirq
sections are legacy).  The vag contract is preserved: ``vag(gdata, nnp,
preset) -> (loss, grad)`` where ``grad`` has nnp's shape with per-slot
gradients scattered at ``(i, preset[i])``; here gradients come from
``jax.value_and_grad`` instead of GradientTape.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Iterator, List, Optional, Sequence, Tuple, Union

import numpy as np
import jax
import jax.numpy as jnp

from ..models.circuit import Circuit
from ..models.densitymatrix import DMCircuit
from ..ops import gates as G
from .dqas import get_op_pool

Tensor = Any
Graph = Any

__all__ = [
    "GHZ_vag",
    "energy",
    "ave_func",
    "exp_forward",
    "cvar",
    "qaoa_vag",
    "qaoa_block_vag",
    "evaluate_vag",
    "noise_forward",
    "maxcut_measurements_tc",
    "tfim_measurements_tc",
    "heisenberg_measurements_tc",
    "qaoa_noise_vag",
    "qaoa_train",
    "compose_tc_circuit_with_multiple_pools",
    "gatewise_vqe_vag",
    "correlation",
]


def GHZ_vag(
    gdata: Any, nnp: Tensor, preset: Sequence[int], verbose: bool = False, n: int = 3
) -> Tuple[Tensor, Tensor]:
    """GHZ-preparation toy DQAS kernel (reference ``vags.py:54``).

    Ops in the pool are strings like "H0", "CNOT01", "I" applied by name;
    loss = 1 - |⟨GHZ|ψ⟩|².
    """
    reference = np.zeros([2**n])
    reference[0] = reference[-1] = 1.0 / np.sqrt(2.0)
    reference = jnp.asarray(reference.astype(np.complex64))
    cset = get_op_pool()

    def forward(_: Tensor) -> Tensor:
        c = Circuit(n)
        for j in preset:
            op = cset[j]
            if isinstance(op, str):
                if op.startswith("CNOT"):
                    c.cnot(int(op[4]), int(op[5]))
                elif op.startswith("H"):
                    c.h(int(op[1]))
                elif op.upper() == "I":
                    pass
                else:
                    getattr(c, op[0].lower())(int(op[1]))
            else:
                op(c)
        psi = c.state()
        overlap = jnp.abs(jnp.vdot(reference, psi)) ** 2
        return 1.0 - overlap

    loss = forward(nnp)
    if verbose:  # pragma: no cover
        print("GHZ loss:", float(jax.device_get(jnp.real(loss))))
    return loss, jnp.zeros_like(jnp.asarray(nnp))


def energy(i: int, n: int, g: Graph) -> float:
    """Maxcut energy of the i-th computational basis state (reference :109)."""
    basis = bin(i)[2:].zfill(n)
    r = 0.0
    for e in g.edges:
        r += g[e[0]][e[1]].get("weight", 1.0) * int(basis[e[0]] != basis[e[1]])
    return r


def ave_func(state: Tensor, g: Graph, *fs: Any) -> Sequence[Tensor]:
    """Averages of transformed maxcut energies over |ψ|² (reference :125).

    Each ``fs`` entry is (f, f2) or (f, f2, f3): result = f2(Σ_i f3?(f(e_i)) p_i).
    """
    n = int(round(np.log2(np.asarray(state.shape[0]))))
    ebasis = np.array([energy(i, n, g) for i in range(2**n)])
    p = jnp.real(jnp.abs(state) ** 2)
    out = []
    for ftuple in fs:
        if len(ftuple) == 2:
            f, f2 = ftuple
            r = jnp.asarray([f(e) for e in ebasis])
        else:
            f, f2, f3 = ftuple
            r = jnp.asarray(f3([f(e) for e in ebasis], p))
        out.append(f2(jnp.real(jnp.tensordot(r.astype(p.dtype), p, axes=[0, 0]))))
    return out


def exp_forward(theta: Tensor, preset: Sequence[int], g: Graph, *fs: Any) -> Sequence[Tensor]:
    """Build the pooled-op circuit and average measurements (reference :173)."""
    n = len(g.nodes)
    ci = Circuit(n)
    cset = get_op_pool()
    for i, j in enumerate(preset):
        if callable(cset[j]):
            cset[j](ci, theta[i], g)
        else:
            layer, graph = cset[j]
            layer(ci, theta[i], graph)
    state = ci.wavefunction()
    return ave_func(state, g, *fs)


def _identity(s: Any) -> Any:
    return s


def _neg(s: Any) -> Any:
    return -s


def _exp_fun(s: Any, lbd: float = 1.0) -> Any:
    return np.exp(-lbd * s)


def _overlap_fun(s: Any, overlap_threhold: float = 0.0) -> Any:
    if s >= overlap_threhold > 0:
        return 1.0
    return 0.0


def cvar(r: List[float], p: Tensor, percent: float = 0.2) -> Sequence[float]:
    """CVaR reweighting of basis energies (as an ``f3``; reference :212)."""
    r = list(r)
    p = np.asarray(jax.device_get(p))
    rs = sorted(enumerate(r), key=lambda s: -s[1])
    sump = 0.0
    count = 0
    while sump < percent and count < len(rs):
        idx = rs[count][0]
        if sump + p[idx] > percent:
            r[idx] = (percent - sump) / p[idx] * r[idx]
            count += 1
            break
        sump += p[idx]
        count += 1
    for i in range(count, len(rs)):
        r[rs[i][0]] = 0.0
    return [k / percent for k in r]


def _scatter_grad(nnp: Tensor, preset: Sequence[int], gr: Tensor) -> Tensor:
    gmatrix = np.zeros_like(np.asarray(jax.device_get(nnp)), dtype=np.float32)
    gr = np.asarray(jax.device_get(jnp.real(gr)))
    gr = np.where(np.isnan(gr), 0.0, gr)
    for i, j in enumerate(preset):
        gmatrix[i, j] = gr[i]
    return jnp.asarray(gmatrix)


def qaoa_vag(
    gdata: Graph,
    nnp: Tensor,
    preset: Sequence[int],
    f: Optional[Tuple[Callable[[float], float], Callable[[Tensor], Tensor]]] = None,
    forward_func: Optional[Callable[..., Any]] = None,
    verbose_fs: Optional[Sequence[Any]] = None,
) -> Tuple[Tensor, Tensor]:
    """QAOA DQAS kernel: loss + gradient matrix (reference ``vags.py:242``)."""
    if forward_func is None:
        forward_func = exp_forward
    if f is None:
        f = (_identity, _neg)
    nnp_np = np.asarray(jax.device_get(nnp))
    pnnp = jnp.asarray(np.array([nnp_np[i, j] for i, j in enumerate(preset)]))

    def lossf(theta: Tensor) -> Tensor:
        return jnp.real(forward_func(theta, preset, gdata, f)[0])

    loss, gr = jax.value_and_grad(lossf)(pnnp)
    if verbose_fs:  # pragma: no cover
        for vf in verbose_fs:
            print(forward_func(pnnp, preset, gdata, vf))
    return loss, _scatter_grad(nnp, preset, gr)


def qaoa_block_vag(
    gdata: Graph,
    nnp: Tensor,
    preset: Sequence[int],
    f: Optional[Tuple[Callable[[float], float], Callable[[Tensor], Tensor]]] = None,
) -> Tuple[Tensor, Tensor]:
    """Block-op DQAS kernel: 2 params per block op (reference ``vags.py:288``).

    ``nnp`` has 2 rows per slot; ops whose repr ends with ``_block`` consume
    both, plain layers consume the first.
    """
    if f is None:
        f = (_identity, _neg)
    nnp_np = np.asarray(jax.device_get(nnp))
    ops = get_op_pool()
    widths = []
    flat = []
    for i, j in enumerate(preset):
        name = getattr(ops[j], "__doc__", "") or ""
        if name.endswith("_block"):
            widths.append(2)
            flat.extend([nnp_np[2 * i, j], nnp_np[2 * i + 1, j]])
        else:
            widths.append(1)
            flat.append(nnp_np[2 * i, j])
    flat = jnp.asarray(np.array(flat))

    def unflatten(v: Tensor) -> List[Tensor]:
        out = []
        k = 0
        for w in widths:
            out.append(v[k : k + w])
            k += w
        return out

    def lossf(v: Tensor) -> Tensor:
        theta = unflatten(v)
        return jnp.real(exp_forward(theta, preset, gdata, f)[0])

    loss, gr = jax.value_and_grad(lossf)(flat)
    gr = np.asarray(jax.device_get(jnp.real(gr)))
    gr = np.where(np.isnan(gr), 0.0, gr)
    gmatrix = np.zeros_like(nnp_np, dtype=np.float32)
    k = 0
    for i, (j, w) in enumerate(zip(preset, widths)):
        gmatrix[2 * i, j] = gr[k]
        if w == 2:
            gmatrix[2 * i + 1, j] = gr[k + 1]
        k += w
    return loss, jnp.asarray(gmatrix)


# energy-objective variants: loss is the raw (negated) energy expectation
_ENERGY_OBJECTIVE = (_identity, _neg)
qaoa_vag_energy = partial(qaoa_vag, f=_ENERGY_OBJECTIVE)
qaoa_block_vag_energy = partial(qaoa_block_vag, f=_ENERGY_OBJECTIVE)


def evaluate_vag(
    params: Any,
    preset: Sequence[int],
    g: Graph,
    lbd: float = 0.0,
    overlap_threhold: float = 0.0,
) -> Tuple[Tensor, Tensor, Tensor, Tensor]:
    """(gibbs objective, energy, gradient, overlap-probability) (ref :348)."""
    params = jnp.asarray(np.asarray(params), dtype=jnp.float32)
    exp_partial = partial(_exp_fun, lbd=lbd)
    overlap_partial = partial(_overlap_fun, overlap_threhold=overlap_threhold)

    def forward(p: Tensor) -> Tuple[Tensor, Tensor, Tensor]:
        expe, ene, probasum = exp_forward(
            p,
            preset,
            g,
            (exp_partial, jnp.log),
            (_identity, _neg),
            (overlap_partial, _identity),
        )
        return jnp.real(expe), jnp.real(ene), jnp.real(probasum)

    def objective(p: Tensor) -> Tensor:
        expe, ene, _ = forward(p)
        return ene if lbd == 0 else expe

    expe, ene, probasum = forward(params)
    gr = jax.grad(objective)(params)
    return expe, ene, jnp.real(gr), probasum


def noise_forward(
    theta: Tensor,
    preset: Sequence[int],
    g: Graph,
    measure_func: Callable[[Any, Graph], Tensor],
    is_mc: bool = False,
) -> Tensor:
    """Noisy pooled-op forward: DMCircuit exact or Circuit MC (reference :391)."""
    n = len(g.nodes)
    ci: Any = Circuit(n) if is_mc else DMCircuit(n)
    cset = get_op_pool()
    for i, j in enumerate(preset):
        entry = cset[j]
        if callable(entry):
            entry(ci, theta[i], g)
        elif len(entry) == 3:
            layer, graph, params = entry
            layer(ci, theta[i], graph, *params)
        elif len(entry) == 4:
            layer, graph, noisemodel, params = entry
            layer(ci, theta[i], graph)
            noisemodel(ci, g, *params)
        elif len(entry) == 2:
            layer, params = entry
            layer(ci, theta[i], g, *params)
        else:
            entry[0](ci, theta[i], g)
    return measure_func(ci, g)


def maxcut_measurements_tc(c: Any, g: Graph) -> Tensor:
    """Maxcut loss Σ w/2 (⟨ZZ⟩ - 1) (reference ``vags.py:422``)."""
    loss = 0.0
    for e in g.edges:
        loss += (
            g[e[0]][e[1]].get("weight", 1.0)
            * 0.5
            * (c.expectation((G.z(), [e[0]]), (G.z(), [e[1]])) - 1.0)
        )
    return loss


def tfim_measurements_tc(
    c: Any, g: Graph, hzz: float = 1.0, hx: float = 0.0, hz: float = 0.0
) -> Tensor:
    """TFIM energy measurement set (reference ``vags.py:433``)."""
    loss = 0.0
    for e in g.edges:
        loss += g[e[0]][e[1]].get("weight", 1.0) * hzz * c.expectation(
            (G.z(), [e[0]]), (G.z(), [e[1]])
        )
    if hx:
        for i in range(len(g.nodes)):
            loss += hx * c.expectation((G.x(), [i]))
    if hz:
        for i in range(len(g.nodes)):
            loss += hz * c.expectation((G.z(), [i]))
    return loss


def heisenberg_measurements_tc(
    c: Any,
    g: Graph,
    hzz: float = 1.0,
    hxx: float = 1.0,
    hyy: float = 1.0,
    hz: float = 0.0,
    hx: float = 0.0,
    hy: float = 0.0,
    reuse: bool = True,
) -> Tensor:
    """Heisenberg energy measurement set (reference ``vags.py:456``)."""
    loss = 0.0
    for e in g.edges:
        w = g[e[0]][e[1]].get("weight", 1.0)
        loss += w * hzz * c.expectation((G.z(), [e[0]]), (G.z(), [e[1]]))
        loss += w * hyy * c.expectation((G.y(), [e[0]]), (G.y(), [e[1]]))
        loss += w * hxx * c.expectation((G.x(), [e[0]]), (G.x(), [e[1]]))
    for coef, gate in ((hx, G.x), (hy, G.y), (hz, G.z)):
        if coef:
            for i in range(len(g.nodes)):
                loss += coef * c.expectation((gate(), [i]))
    return loss


def qaoa_noise_vag(
    gdata: Graph,
    nnp: Tensor,
    preset: Sequence[int],
    measure_func: Optional[Callable[[Any, Graph], Tensor]] = None,
    forward_func: Optional[Callable[..., Tensor]] = None,
    **kws: Any,
) -> Tuple[Tensor, Tensor]:
    """Noisy QAOA DQAS kernel (reference ``vags.py:496``)."""
    if measure_func is None:
        measure_func = maxcut_measurements_tc
    if forward_func is None:
        forward_func = noise_forward
    nnp_np = np.asarray(jax.device_get(nnp))
    pnnp = jnp.asarray(np.array([nnp_np[i, j] for i, j in enumerate(preset)]))

    def lossf(theta: Tensor) -> Tensor:
        return jnp.real(forward_func(theta, preset, gdata, measure_func, **kws))

    loss, gr = jax.value_and_grad(lossf)(pnnp)
    return loss, _scatter_grad(nnp, preset, gr)


def qaoa_train(
    preset: Sequence[int],
    g: Union[Graph, Iterator[Graph]],
    epochs: int = 60,
    batch: int = 1,
    initial_param: Optional[Any] = None,
    opt: Any = None,
    lbd: float = 0.0,
    overlap_threhold: float = 0.0,
    verbose: bool = True,
) -> Tuple[Any, Sequence[Tensor], Sequence[Tensor], Sequence[Tensor]]:
    """Train a fixed QAOA architecture over (a stream of) graphs (ref :534)."""
    import optax

    if initial_param is None:
        rng = np.random.default_rng()
        initial_param = 0.3 + 0.05 * rng.standard_normal(len(preset))
    theta = jnp.asarray(np.asarray(initial_param), dtype=jnp.float32)
    if opt is None:
        opt = optax.adam(1e-2)
    state = opt.init(theta)
    if hasattr(g, "edges"):

        def one_generator() -> Iterator[Graph]:
            while True:
                yield g

        gen = one_generator()
    else:
        gen = g
    gibbs_history, mean_history, overlap_history = [], [], []
    for _epoch in range(epochs):
        grads = jnp.zeros_like(theta)
        for _ in range(batch):
            gdata = next(gen)
            expe, ene, gr, probasum = evaluate_vag(
                theta, preset, gdata, lbd=lbd, overlap_threhold=overlap_threhold
            )
            grads = grads + gr / batch
        gibbs_history.append(expe)
        mean_history.append(ene)
        overlap_history.append(probasum)
        updates, state = opt.update(grads, state, theta)
        theta = optax.apply_updates(theta, updates)
        if verbose and _epoch % 10 == 0:  # pragma: no cover
            print(f"epoch {_epoch}: energy {float(np.real(np.asarray(ene))):.6f}")
    return theta, mean_history, gibbs_history, overlap_history


def compose_tc_circuit_with_multiple_pools(
    c: Circuit,
    presets: Sequence[Sequence[int]],
    pools: Sequence[Sequence[Any]],
    thetas: Sequence[Tensor],
    g: Graph,
) -> Circuit:
    """Apply several (preset, pool, theta) stacks onto one circuit (ref :613)."""
    for preset, pool, theta in zip(presets, pools, thetas):
        for i, j in enumerate(preset):
            pool[j](c, theta[i], g)
    return c


def gatewise_vqe_vag(
    gdata: Graph,
    nnp: Tensor,
    preset: Sequence[int],
    measure_func: Optional[Callable[[Any, Graph], Tensor]] = None,
) -> Tuple[Tensor, Tensor]:
    """Gate-wise VQE DQAS kernel: pool entries are (gate_name, qubits) (ref :642)."""
    if measure_func is None:
        measure_func = tfim_measurements_tc
    cset = get_op_pool()
    n = len(gdata.nodes)
    nnp_np = np.asarray(jax.device_get(nnp))
    pnnp = jnp.asarray(np.array([nnp_np[i, j] for i, j in enumerate(preset)]))

    def lossf(theta: Tensor) -> Tensor:
        c = Circuit(n)
        for i, j in enumerate(preset):
            name, qubits = cset[j]
            meth = getattr(c, name.lower())
            if name.lower() in ("h", "x", "y", "z", "cnot", "cx", "cz", "swap", "i"):
                if name.lower() != "i":
                    meth(*qubits)
            else:
                meth(*qubits, theta=theta[i])
        return jnp.real(measure_func(c, gdata))

    loss, gr = jax.value_and_grad(lossf)(pnnp)
    return loss, _scatter_grad(nnp, preset, gr)


def correlation(m: Tensor, rho: Tensor) -> Tensor:
    """tr(m ρ) (reference ``vags.py`` helper)."""
    return jnp.real(jnp.trace(jnp.asarray(m) @ jnp.asarray(rho)))


# re-exports used by reference scripts (defined in the quantum toolbox here)
from ..quantum import (  # noqa: E402,F401
    entropy,
    renyi_entropy,
    reduced_density_matrix,
    entanglement_entropy,
    free_energy,
    renyi_free_energy,
    taylorlnm,
    truncated_free_energy,
    trace_distance,
    fidelity,
    gibbs_state,
    double_state,
)
