"""Checkpoint / resume: NPZ snapshots of (S, t, dt, step).

The reference has output-only dumps and no restart reader (SURVEY §5);
this is a deliberate capability win: a bitwise state snapshot sufficient
to resume the adaptive-dt loop exactly.
"""

from __future__ import annotations

import numpy as np


def save(path: str, S: dict, t: float, dt: float, step: int):
    np.savez(path,
             x=np.asarray(S["x"]), v=np.asarray(S["v"]),
             e=np.asarray(S["e"]),
             t=np.float64(t), dt=np.float64(dt), step=np.int64(step))


def load(path: str):
    import jax.numpy as jnp

    z = np.load(path)
    S = {"x": jnp.asarray(z["x"]), "v": jnp.asarray(z["v"]),
         "e": jnp.asarray(z["e"])}
    return S, float(z["t"]), float(z["dt"]), int(z["step"])
