"""Simulators: one per physics regime (SURVEY.md §2.3)."""

from .circuit import Circuit, expectation
from .densitymatrix import DMCircuit, DMCircuit2, DensityMatrixCircuit
