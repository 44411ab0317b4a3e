"""Operators: gates, channels, qudit gates, Pauli algebra."""
