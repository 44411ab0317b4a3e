"""Challenge problem 9: random local light-cone optimization (512 qubits).

Spec: reference ``examples/challenge_suite/problem_9.md``. The two Pauli
terms' causal cones (18 and 15 qubits) are extracted from the 3897-gate
tape by a reverse walk; each cone becomes a small dense simulation with
parameters gathered from the full 512-qubit parameter vector, so gradients
address the full tape while never touching 2^512 anything. All 200
restarts train simultaneously: a vmapped Adam loop over the cone
simulations (20,000 restart-steps in one XLA program).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import numpy as np
import jax
import jax.numpy as jnp

from tensorcircuit_ng_tpu.core import statevec as sv
from tensorcircuit_ng_tpu.ops import gates as G

PAULI = {
    "x": np.array([[0, 1], [1, 0]], dtype=complex),
    "y": np.array([[0, -1j], [1j, 0]], dtype=complex),
    "z": np.diag([1.0, -1.0]).astype(complex),
}
MAT1 = {"rx": G.rx_matrix, "ry": G.ry_matrix, "rz": G.rz_matrix}
MAT2 = {"rxx": G.rxx_matrix, "ryy": G.ryy_matrix, "rzz": G.rzz_matrix}


def ladder_edges(n):
    cols = n // 2
    edges = []
    for c in range(cols):
        a, b = 2 * c, 2 * c + 1
        edges.append((a, b))
        if c + 1 < cols:
            edges.append((a, a + 2))
            edges.append((b, b + 2))
            edges.append((a, b + 2) if c % 2 == 0 else (b, a + 2))
    return edges


def generate_gate_tape(config):
    """Deterministic tape per the evaluator's published generator (spec)."""
    rng = np.random.default_rng(config["seed"])
    singles = ("rx", "ry", "rz")
    twos = ("rxx", "ryy", "rzz")
    graph = ladder_edges(config["n_qubits"])
    tape = []
    pidx = 0
    for _ in range(config["n_layers"]):
        for q in range(config["n_qubits"]):
            tape.append((singles[int(rng.integers(3))], q, pidx))
            pidx += 1
        edges = list(graph)
        rng.shuffle(edges)
        used = set()
        for qa, qb in edges:
            if qa in used or qb in used:
                continue
            if rng.random() > config["edge_keep_prob"]:
                continue
            tape.append((twos[int(rng.integers(3))], qa, qb, pidx))
            pidx += 1
            used.add(qa)
            used.add(qb)
    return tuple(tape), pidx


def cone_of(tape, term_qubits):
    """Reverse-walk causal cone: kept tape entries (forward order) + qubits."""
    cone = set(term_qubits)
    kept = []
    for entry in reversed(tape):
        qs = entry[1:-1]
        if cone.intersection(qs):
            kept.append(entry)
            cone.update(qs)
    return list(reversed(kept)), sorted(cone)


def run_solution(config):
    if "gate_tape" in config:
        tape = config["gate_tape"]
        pcount = config["parameter_count"]
    else:
        tape, pcount = generate_gate_tape(config)
    terms = config.get(
        "pauli_terms",
        (
            (0.5645931361768194, (("x", 388), ("z", 390))),
            (1.0, (("x", 16), ("y", 19))),
        ),
    )
    restarts = config["n_restarts"]
    steps = config["max_steps"]
    lr = config["learning_rate"]
    scale = config["initial_parameter_scale"]
    seed = config["seed"]

    cone_fns = []
    for weight, paulis in terms:
        term_qs = [q for _, q in paulis]
        kept, cone = cone_of(tape, term_qs)
        pos = {q: i for i, q in enumerate(cone)}
        w = len(cone)

        def make(kept=kept, pos=pos, w=w, paulis=paulis, weight=weight):
            def expect(theta):
                psi = jnp.full((2**w,), 2.0 ** (-w / 2), dtype=jnp.complex64)
                for entry in kept:
                    name, pidx = entry[0], entry[-1]
                    th = theta[pidx]
                    if len(entry) == 3:
                        g = MAT1[name](th).astype(jnp.complex64)
                        psi = sv.apply_unitary(psi, g, [pos[entry[1]]])
                    else:
                        g = MAT2[name](th).astype(jnp.complex64)
                        psi = sv.apply_unitary(psi, g, [pos[entry[1]], pos[entry[2]]])
                phi = psi
                for pn, q in paulis:
                    phi = sv.apply_unitary(phi, PAULI[pn], [pos[q]])
                return weight * jnp.real(jnp.vdot(psi, phi))

            return expect

        cone_fns.append(make())

    def objective(theta):
        return sum(f(theta) for f in cone_fns)

    import optax

    opt = optax.adam(lr)

    def one_restart(theta0):
        os0 = opt.init(theta0)

        def body(carry, _):
            th, os_ = carry
            val, g = jax.value_and_grad(lambda t: -objective(t))(th)
            up, os_ = opt.update(g, os_, th)
            return (optax.apply_updates(th, up), os_), -val

        (_, _), hist = jax.lax.scan(body, (theta0, os0), None, length=steps)
        return hist

    inits = np.stack(
        [
            np.random.default_rng(seed + 100000 + r).normal(0, scale, pcount)
            for r in range(restarts)
        ]
    ).astype(np.float32)

    run = jax.jit(jax.vmap(one_restart))
    hist = run(jnp.asarray(inits))
    return {"observable_history": np.asarray(hist, dtype=np.float64)}


if __name__ == "__main__":
    import time

    config = {
        "n_qubits": 512,
        "n_layers": 6,
        "max_steps": 100,
        "n_restarts": 200,
        "learning_rate": 0.03,
        "initial_parameter_scale": 0.02,
        "seed": 2035,
        "edge_keep_prob": 0.24,
        "success_threshold": 1.0,
    }
    tape, pcount = generate_gate_tape(config)
    sizes = [len(cone_of(tape, [q for _, q in ps])[1]) for _, ps in (
        (0.5645931361768194, (("x", 388), ("z", 390))),
        (1.0, (("x", 16), ("y", 19))),
    )]
    print(f"tape {len(tape)} gates, {pcount} params; cone sizes {sizes}")
    t0 = time.time()
    res = run_solution(config)
    dt = time.time() - t0
    h = res["observable_history"]
    final = h[:, -1]
    print(
        f"problem 9: {dt:.2f}s for {h.shape[0]}x{h.shape[1]} restart-steps; "
        f"best {final.max():.4f}, mean {final.mean():.4f}, "
        f"success@1.0 {float((final > 1.0).mean()):.2f}"
    )
    assert final.max() > 1.0
