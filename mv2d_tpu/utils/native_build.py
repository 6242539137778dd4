"""On-demand build of the in-repo C++ host library (csrc/).

The .so is a build artifact (not committed); loaders call ensure_built()
so a fresh checkout works without a manual `make` step.
"""
from __future__ import annotations

import os
import subprocess
import threading

_lock = threading.Lock()
_attempted = False

CSRC_DIR = os.path.abspath(os.path.join(os.path.dirname(__file__),
                                        os.pardir, os.pardir, 'csrc'))
LIB_PATH = os.path.join(CSRC_DIR, 'build', 'libmv2d_host.so')


def ensure_built() -> str | None:
    """Returns the .so path, building it with make if missing; None if the
    build fails (callers fall back to pure-python paths)."""
    global _attempted
    if os.path.exists(LIB_PATH):
        return LIB_PATH
    with _lock:
        if os.path.exists(LIB_PATH):
            return LIB_PATH
        if _attempted:
            return None
        _attempted = True
        try:
            subprocess.run(['make', '-C', CSRC_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    return LIB_PATH if os.path.exists(LIB_PATH) else None
