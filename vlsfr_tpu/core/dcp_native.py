"""ctypes binding for the C++ DCP batch planner (csrc/dcp_planner.cc).

Drop-in replacement for core.dcp.DCPManager with identical semantics
(property-tested against it). Use :func:`create_dcp_manager` to get the
native planner when the toolchain is available, else the Python one.
"""

from __future__ import annotations

import ctypes

import numpy as np

from vlsfr_tpu.core.dcp import DCPManager, PassIndices, StepIndices

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    from vlsfr_tpu.csrc.build import build_native

    path = build_native()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.dcp_create.argtypes = [ctypes.c_int64]
    lib.dcp_create.restype = ctypes.c_void_p
    lib.dcp_destroy.argtypes = [ctypes.c_void_p]
    lib.dcp_plan_step.argtypes = [ctypes.c_void_p, i64p, i64p, ctypes.c_int64,
                                  i32p, i32p, f32p, i32p, i32p, i32p, f32p, i32p]
    lib.dcp_size.argtypes = [ctypes.c_void_p]
    lib.dcp_size.restype = ctypes.c_int64
    lib.dcp_export.argtypes = [ctypes.c_void_p, i64p, i64p, i32p]
    lib.dcp_restore.argtypes = [ctypes.c_void_p, i64p, i64p, ctypes.c_int64, i32p]
    lib.dcp_clear.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


class NativeDCPManager:
    """Same surface as DCPManager; state lives in the C++ planner."""

    def __init__(self, queue_size: int):
        lib = _load()
        if lib is None:
            raise RuntimeError("native planner unavailable")
        self._lib = lib
        self.queue_size = queue_size
        self._h = lib.dcp_create(queue_size)

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._lib.dcp_destroy(self._h)
                self._h = None
        except Exception:  # interpreter teardown: ctypes may be gone
            pass

    def plan_step(self, x_labels, y_labels) -> StepIndices:
        x = np.ascontiguousarray(x_labels, dtype=np.int64)
        y = np.ascontiguousarray(y_labels, dtype=np.int64)
        n = len(x)
        assert len(y) == n
        out = [np.empty(n, dt) for dt in
               (np.int32, np.int32, np.float32, np.int32,
                np.int32, np.int32, np.float32, np.int32)]
        self._lib.dcp_plan_step(
            self._h, _ptr(x, ctypes.c_int64), _ptr(y, ctypes.c_int64), n,
            _ptr(out[0], ctypes.c_int32), _ptr(out[1], ctypes.c_int32),
            _ptr(out[2], ctypes.c_float), _ptr(out[3], ctypes.c_int32),
            _ptr(out[4], ctypes.c_int32), _ptr(out[5], ctypes.c_int32),
            _ptr(out[6], ctypes.c_float), _ptr(out[7], ctypes.c_int32),
        )
        return StepIndices(
            a=PassIndices(rows=out[0], cols=out[1], seen=out[2], fake_labels=out[3]),
            b=PassIndices(rows=out[4], cols=out[5], seen=out[6], fake_labels=out[7]),
        )

    # -- checkpoint surface (same format as DCPManager) -----------------
    def state_dict(self) -> dict:
        n = self._lib.dcp_size(self._h)
        keys = np.empty(n, np.int64)
        slots = np.empty(n, np.int64)
        parity = np.empty(self.queue_size, np.int32)
        self._lib.dcp_export(self._h, _ptr(keys, ctypes.c_int64),
                             _ptr(slots, ctypes.c_int64), _ptr(parity, ctypes.c_int32))
        return {
            "lru": list(zip(keys.tolist(), slots.tolist())),
            "parity": parity,
            "queue_size": self.queue_size,
        }

    def restore(self, state: dict) -> None:
        assert state["queue_size"] == self.queue_size
        kvs = np.asarray(state["lru"], dtype=np.int64).reshape(-1, 2)
        keys = np.ascontiguousarray(kvs[:, 0])
        slots = np.ascontiguousarray(kvs[:, 1])
        parity = np.ascontiguousarray(state["parity"], dtype=np.int32)
        self._lib.dcp_restore(self._h, _ptr(keys, ctypes.c_int64),
                              _ptr(slots, ctypes.c_int64), len(keys),
                              _ptr(parity, ctypes.c_int32))


def create_dcp_manager(queue_size: int, native: bool | str = "auto"):
    """Factory: native C++ planner when available, Python otherwise."""
    if native == "auto":
        native = native_available()
    if native:
        return NativeDCPManager(queue_size)
    return DCPManager(queue_size)
