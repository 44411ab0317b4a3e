"""Measurement results processing: counts toolbox + readout mitigation."""

from . import counts
from .readout_mitigation import ReadoutMit

__all__ = ["counts", "ReadoutMit"]
