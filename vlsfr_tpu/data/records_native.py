"""ctypes binding for the native record-store reader (csrc/record_store.cc).

Used transparently by FaceRecordReader when the native library builds:
payload reads become zero-copy views into the C++ mmap (no Python mmap
bookkeeping), and ``gather`` fetches whole batches GIL-free.
"""

from __future__ import annotations

import ctypes

import numpy as np

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
    lib.rs_open.argtypes = [ctypes.c_char_p]
    lib.rs_open.restype = ctypes.c_void_p
    lib.rs_close.argtypes = [ctypes.c_void_p]
    lib.rs_count.argtypes = [ctypes.c_void_p]
    lib.rs_count.restype = ctypes.c_int64
    lib.rs_labels.argtypes = [ctypes.c_void_p]
    lib.rs_labels.restype = ctypes.POINTER(ctypes.c_int64)
    lib.rs_payload.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                               ctypes.POINTER(ctypes.c_int64)]
    lib.rs_payload.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.rs_gather.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
                              ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8),
                              ctypes.POINTER(ctypes.c_int64)]
    lib.rs_batch_size.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
                                  ctypes.c_int64]
    lib.rs_batch_size.restype = ctypes.c_int64
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


class NativeRecordReader:
    """Same read surface as data.records.FaceRecordReader."""

    def __init__(self, directory: str):
        lib = _load()
        if lib is None:
            raise RuntimeError("native record reader unavailable")
        self._lib = lib
        self._h = lib.rs_open(directory.encode())
        if not self._h:
            raise FileNotFoundError(f"cannot open record store at {directory}")
        n = lib.rs_count(self._h)
        self.labels = np.ctypeslib.as_array(lib.rs_labels(self._h), shape=(n,)).copy()

    def __len__(self) -> int:
        return len(self.labels)

    def payload(self, i: int) -> bytes:
        size = ctypes.c_int64()
        ptr = self._lib.rs_payload(self._h, i, ctypes.byref(size))
        return ctypes.string_at(ptr, size.value)

    def gather(self, indices) -> tuple[np.ndarray, np.ndarray]:
        """Batched fetch: (buffer, prefix_offsets[n+1]) — record j is
        buffer[offsets[j]:offsets[j+1]]."""
        idx = np.ascontiguousarray(indices, dtype=np.int64)
        n = len(idx)
        ip = idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
        total = self._lib.rs_batch_size(self._h, ip, n)
        out = np.empty(total, np.uint8)
        offs = np.empty(n + 1, np.int64)
        self._lib.rs_gather(self._h, ip, n,
                            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                            offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        return out, offs

    def close(self) -> None:
        if getattr(self, "_h", None):
            self._lib.rs_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:  # interpreter teardown
            pass
