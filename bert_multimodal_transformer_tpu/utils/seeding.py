"""Seeding / determinism.

Mirrors set_random_seed (multimodal_driver.py:289-308) and the custom
``seed`` argparse type (argparse_utils.py:18-31: int 0-9999 or "random").
JAX is functionally deterministic given a PRNGKey; host-side numpy/python
RNGs are seeded for the data-shuffling path.
"""

from __future__ import annotations

import os
import random
from typing import Union

import jax
import numpy as np


def parse_seed(s: Union[str, int]) -> int:
    """"random" → randint(0, 9999); otherwise int in [0, 9999]."""
    if isinstance(s, int):
        return s
    if s == "random":
        return random.randint(0, 9999)
    value = int(s)
    if not 0 <= value <= 9999:
        raise ValueError(f"seed must be in [0, 9999], got {value}")
    return value


def str2bool(v: Union[str, bool]) -> bool:
    """argparse bool type (argparse_utils.py:5-15)."""
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise ValueError(f"Boolean value expected, got {v!r}")


def set_random_seed(seed: int) -> jax.Array:
    """Seed host RNGs and return the root JAX PRNGKey."""
    random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)
