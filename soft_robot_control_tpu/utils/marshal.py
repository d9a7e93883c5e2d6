"""Flat-array marshalling helpers.

Capability parity with the reference's RPC wire helpers
(sofacontrol/utils.py:417-431, used by the GuSTOsrv float64[] messages):
kept for API familiarity and for any external transport a user wires in.
"""

from __future__ import annotations

import numpy as np


def arr2np(x, dim: int, squeeze: bool = False) -> np.ndarray:
    """Flat list -> (-1, dim) float64 array (optionally squeezed)."""
    a = np.asarray(x, dtype="float64").reshape(-1, dim)
    return a.squeeze() if squeeze else a


def np2arr(x) -> list:
    """Array -> flat python list."""
    return np.asarray(x).flatten().tolist()
