"""Small shared helpers (reference: utils/utils.py:12-50)."""

from __future__ import annotations

import datetime
import os
from typing import Any

import jax
import numpy as np
import yaml

__all__ = ["mkdir_p", "get_time_stamp", "save_args", "params_count"]


def mkdir_p(path: str) -> None:
    """reference: utils/utils.py:16-23."""
    os.makedirs(path, exist_ok=True)


def get_time_stamp() -> str:
    """reference: utils/utils.py:26-29."""
    return datetime.datetime.now().strftime("%Y_%m_%d_%H_%M_%S")


def save_args(save_path: str, args: Any) -> None:
    """Dump the run config next to its artifacts (reference: utils/utils.py:47-50)."""
    d = args.to_dict() if hasattr(args, "to_dict") else dict(vars(args))
    with open(save_path, "w") as fp:
        yaml.safe_dump({k: v for k, v in d.items()
                        if isinstance(v, (int, float, str, bool, list))}, fp)


def params_count(params) -> int:
    """Total parameter count of a pytree (reference: utils/utils.py:12-13)."""
    return int(sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(params)))
