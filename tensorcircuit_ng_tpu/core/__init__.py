"""Core numerics: einsum IR, contraction, statevector engine, AD-safe linalg."""
