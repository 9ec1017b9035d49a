"""Signature-guarded checkpoint/restart.

Maps the reference's restart subsystem (SPH_Poiseuille.m:127-163, 434-445,
607-610): a restart file written at every output point containing
{pos, vel, rho, p, drho_dt, force, force_prior, t, step} plus a config
signature string. On resume the signature must match exactly and every
array must have the expected shape; any mismatch falls back to a clean
start with a printed reason. Storage is ``.npz`` (the TPU-native analogue
of the reference's -v7.3 .mat), written atomically (tmp + rename).
"""

from __future__ import annotations

import os
import tempfile
from typing import Optional, Tuple

import numpy as np

_FIELDS_1D = ("x", "y", "vx", "vy", "rho", "p", "drho_dt",
              "fx", "fy", "fpx", "fpy")


def save_restart(path: str, signature: str, state, t: float, step: int):
    """Atomically write the restart file (reference: save_restart,
    SPH_Poiseuille.m:607-610)."""
    parent = os.path.dirname(path) or "."
    os.makedirs(parent, exist_ok=True)
    payload = {name: np.asarray(getattr(state, name)) for name in _FIELDS_1D}
    payload["t"] = np.float64(t)
    payload["step"] = np.int64(step)
    payload["config_signature"] = np.array(signature)
    fd, tmp = tempfile.mkstemp(dir=parent, suffix=".npz.tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **payload)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_restart(path: str, signature: str, n_total: int
                 ) -> Tuple[Optional[dict], str]:
    """Validate + load a restart file.

    Returns (payload, reason): payload is None when the file is unusable,
    with ``reason`` explaining why (mirrors the reference's fallback prints,
    SPH_Poiseuille.m:156-162).
    """
    if not os.path.exists(path):
        return None, "restart file does not exist"
    try:
        with np.load(path, allow_pickle=False) as data:
            if "config_signature" not in data or "t" not in data \
                    or "step" not in data:
                return None, "restart file missing required fields"
            if str(data["config_signature"]) != signature:
                return None, "restart signature mismatch"
            out = {}
            for name in _FIELDS_1D:
                if name not in data:
                    return None, f"restart file missing array {name!r}"
                arr = data[name]
                if arr.shape != (n_total,):
                    return None, (f"restart array {name!r} has shape "
                                  f"{arr.shape}, expected ({n_total},)")
                out[name] = arr
            out["t"] = float(data["t"])
            out["step"] = int(data["step"])
            return out, "ok"
    except (OSError, ValueError) as e:
        return None, f"restart file unreadable: {e}"
