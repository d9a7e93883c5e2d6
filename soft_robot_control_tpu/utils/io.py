"""Artifact IO: pickle + MATLAB .mat loaders.

Keeps byte-compatibility with the reference's artifact formats so models
trained/collected with the reference pipeline load directly:
- pickle save/load (sofacontrol/utils.py:148-159)
- TPWL snapshot dictionaries (sofacontrol/tpwl/tpwl_utils.py:150-153)
- POD pickles (sofacontrol/mor/pod.py:137-141)
- SSM / Koopman .mat files (sofacontrol/SSM/ssm.py:30-51,
  sofacontrol/baselines/koopman/koopman_utils.py:115-143)
"""

from __future__ import annotations

import os
import pickle
from typing import Any


def save_data(filename: str, data: Any) -> None:
    d = os.path.dirname(filename)
    if d and not os.path.isdir(d):
        os.makedirs(d, exist_ok=True)
    with open(filename, "wb") as f:
        pickle.dump(data, f, protocol=pickle.HIGHEST_PROTOCOL)


def load_data(filename: str) -> Any:
    with open(filename, "rb") as f:
        return pickle.load(f)


def load_mat(filename: str) -> dict:
    """Load a MATLAB .mat file (scipy.io); struct arrays kept as-is so
    reference-style ``model['w_coeff'][0, 0]`` indexing works."""
    from scipy.io import loadmat

    return loadmat(filename)
