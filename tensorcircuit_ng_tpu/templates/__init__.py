"""Templates: lattices, measurements, Hamiltonians, circuit blocks, datasets."""

from . import chems
from . import lattice
from . import measurements
from . import hamiltonians
from . import blocks
from . import graphs
from . import conversions
from . import ansatz
from . import dataset
