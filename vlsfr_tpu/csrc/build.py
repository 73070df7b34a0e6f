"""Build the native host-runtime library (g++ → shared object, cached).

Compiled on first use into csrc/build/; rebuilds automatically when any
source file is newer than the library. No external deps beyond libstdc++.
"""

from __future__ import annotations

import os
import subprocess

_CSRC = os.path.dirname(os.path.abspath(__file__))
_BUILD = os.path.join(_CSRC, "build")
_SOURCES = ["dcp_planner.cc", "record_store.cc"]
_LIB = os.path.join(_BUILD, "libvlsfr_host.so")


def build_native(force: bool = False) -> str | None:
    """Returns path to the shared library, or None if the build fails."""
    srcs = [os.path.join(_CSRC, s) for s in _SOURCES if os.path.exists(os.path.join(_CSRC, s))]
    if not srcs:
        return None
    if not force and os.path.exists(_LIB):
        lib_mtime = os.path.getmtime(_LIB)
        if all(os.path.getmtime(s) <= lib_mtime for s in srcs):
            return _LIB
    os.makedirs(_BUILD, exist_ok=True)
    cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
           "-o", _LIB, *srcs]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        import logging

        logging.getLogger("vlsfr").warning(
            "native build failed (%s); falling back to pure Python", getattr(e, "stderr", e)
        )
        return None
    return _LIB
