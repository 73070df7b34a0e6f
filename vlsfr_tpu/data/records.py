"""Face record store: append-only blob log + numpy index.

Replaces the reference's LMDB + "key label" manifest combo
(/root/reference/data/creat_lmdb.py:6-76, util/lmdb_loader.py:12-132) with a
single coherent format — the reference stores raw JPEG bytes but its trainer
parses them as Caffe ``Datum`` protobufs (a real end-to-end format mismatch,
SURVEY.md §0); here there is ONE format:

    <dir>/data.bin      concatenated encoded image payloads (JPEG)
    <dir>/index.npz     offsets[u64], lengths[u32], labels[i64]
    <dir>/keys.txt      one record key per line (same order)
    <dir>/train_kv.txt  "key label" manifest, kept for reference-tool compat

Readers ``mmap`` data.bin — zero-copy, safe to share across threads and
processes with no locks (the reference needed per-worker lazy LMDB opens,
util/lmdb_loader.py:59-71). The optional C++ fast path (csrc/) indexes the
same files.

``MultiSourceReader`` merges several stores with cross-source label re-basing
using the same running-offset rule as the reference loader
(util/lmdb_loader.py:32-43: each source's labels are shifted past the
previous max+1).
"""

from __future__ import annotations

import mmap
import os
from dataclasses import dataclass

import numpy as np


class FaceRecordWriter:
    """Streaming writer; call ``add`` per image then ``close``."""

    def __init__(self, directory: str):
        os.makedirs(directory, exist_ok=True)
        self.dir = directory
        self._data = open(os.path.join(directory, "data.bin"), "wb")
        self._offsets: list[int] = []
        self._lengths: list[int] = []
        self._labels: list[int] = []
        self._keys: list[str] = []
        self._pos = 0

    def add(self, key: str, label: int, payload: bytes) -> None:
        self._data.write(payload)
        self._offsets.append(self._pos)
        self._lengths.append(len(payload))
        self._labels.append(int(label))
        self._keys.append(key)
        self._pos += len(payload)

    def close(self) -> None:
        self._data.close()
        offsets = np.asarray(self._offsets, dtype=np.uint64)
        lengths = np.asarray(self._lengths, dtype=np.uint32)
        labels = np.asarray(self._labels, dtype=np.int64)
        np.savez(
            os.path.join(self.dir, "index.npz"),
            offsets=offsets,
            lengths=lengths,
            labels=labels,
        )
        # flat binary twin of the index for the native (C++) reader:
        # header = magic "VLFR" + u32 version + u64 count, then the 3 arrays
        with open(os.path.join(self.dir, "index.bin"), "wb") as f:
            f.write(b"VLFR")
            f.write(np.uint32(1).tobytes())
            f.write(np.uint64(len(offsets)).tobytes())
            f.write(offsets.tobytes())
            f.write(lengths.tobytes())
            f.write(labels.tobytes())
        with open(os.path.join(self.dir, "keys.txt"), "w") as f:
            f.write("\n".join(self._keys) + ("\n" if self._keys else ""))
        # reference-format manifest (creat_lmdb.py:67: "key label" per line)
        with open(os.path.join(self.dir, "train_kv.txt"), "w") as f:
            for k, l in zip(self._keys, self._labels):
                f.write(f"{k} {l}\n")

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class FaceRecordReader:
    """mmap-backed random-access reader for one store."""

    def __init__(self, directory: str):
        self.dir = directory
        idx = np.load(os.path.join(directory, "index.npz"))
        self.offsets = idx["offsets"]
        self.lengths = idx["lengths"]
        self.labels = idx["labels"]
        self._file = open(os.path.join(directory, "data.bin"), "rb")
        size = os.path.getsize(os.path.join(directory, "data.bin"))
        self._mm = (
            mmap.mmap(self._file.fileno(), size, access=mmap.ACCESS_READ) if size else b""
        )

    def __len__(self) -> int:
        return len(self.offsets)

    def payload(self, i: int) -> bytes:
        o, l = int(self.offsets[i]), int(self.lengths[i])
        return bytes(self._mm[o : o + l])

    def close(self) -> None:
        if not isinstance(self._mm, bytes):
            self._mm.close()
        self._file.close()


def open_reader(directory: str, native: bool | str = "auto"):
    """Open one store: native C++ mmap reader when available (needs the
    index.bin twin written by FaceRecordWriter), else the Python reader."""
    if native != False:  # noqa: E712 — "auto" and True both try native
        try:
            import os as _os

            if _os.path.exists(_os.path.join(directory, "index.bin")):
                from vlsfr_tpu.data.records_native import NativeRecordReader, native_available

                if native_available():
                    return NativeRecordReader(directory)
        except Exception:
            if native is True:
                raise
    return FaceRecordReader(directory)


@dataclass
class _Source:
    reader: object  # FaceRecordReader | NativeRecordReader
    label_offset: int


class MultiSourceReader:
    """N stores presented as one dataset with re-based global labels.

    Reproduces the reference's label re-basing semantics
    (util/lmdb_loader.py:27-43): labels of source k are shifted by the running
    ``last_label``; after each source, ``last_label = max_label + 1``.
    ``num_class`` is the final ``last_label``.
    """

    def __init__(self, directories: list[str] | str, native: bool | str = "auto"):
        if isinstance(directories, str):
            directories = [directories]
        assert directories, "need at least one source"
        self.sources: list[_Source] = []
        last_label = 0
        max_label = 0
        counts = []
        all_labels = []
        for d in directories:
            r = open_reader(d, native=native)
            self.sources.append(_Source(reader=r, label_offset=last_label))
            if len(r):
                shifted = r.labels + last_label
                all_labels.append(shifted)
                max_label = max(max_label, int(shifted.max()))
            counts.append(len(r))
            if max_label != last_label or len(r):
                max_label += 1
                last_label = max_label
        self.num_class = last_label
        self._counts = np.asarray(counts)
        self._starts = np.concatenate([[0], np.cumsum(self._counts)])
        self.labels = (
            np.concatenate(all_labels) if all_labels else np.zeros(0, dtype=np.int64)
        )

    def __len__(self) -> int:
        return int(self._starts[-1])

    def _locate(self, i: int) -> tuple[_Source, int]:
        s = int(np.searchsorted(self._starts, i, side="right")) - 1
        return self.sources[s], i - int(self._starts[s])

    def payload(self, i: int) -> bytes:
        src, j = self._locate(i)
        return src.reader.payload(j)

    def label(self, i: int) -> int:
        return int(self.labels[i])

    def labels_by_identity(self) -> dict[int, np.ndarray]:
        """identity -> record indices (for the pair sampler); insertion order
        follows first appearance, like the reference's label_set
        (util/lmdb_loader.py:156-169)."""
        order: dict[int, list[int]] = {}
        for i, l in enumerate(self.labels):
            order.setdefault(int(l), []).append(i)
        return {k: np.asarray(v) for k, v in order.items()}

    def close(self) -> None:
        for s in self.sources:
            s.reader.close()
