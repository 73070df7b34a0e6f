"""Input pipeline: deterministic samplers, host decode, async prefetch.

Rebuilds the reference's two-DataLoader arrangement (main.py:102-111) —
an *instance* stream (uniformly shuffled single images,
util/lmdb_loader.py:12-132) and an *identity-pair* stream (two images of one
identity per element, util/lmdb_loader.py:134-237) — and the per-step FFC
batch composition (main.py:53-60):

    x = [pair_img1 ; instance_half1]   x_label = [pair_ids ; labels_half1]
    y = [pair_img2 ; instance_half2]   y_label = [pair_ids ; labels_half2]

TPU-first design decisions:

* **Stateless determinism**: sample order and flip decisions derive from
  ``(seed, epoch, position)`` via counter-based RNG — any step is
  reconstructable for resume without replaying the stream (the reference's
  DataLoader workers are nondeterministic across runs).
* **Static shapes**: trailing partial batches are dropped so one XLA
  compilation serves every step (the reference pads nothing and would
  recompile per tail batch under jit).
* **Host decode, device math**: JPEG decode + resize happen on host threads
  (cv2 releases the GIL); flip + normalize are cheap and fused here too so
  the device receives ready NHWC float32 (normalization contract
  (x − 127.5) · 0.0078125, grayscale→3ch: util/lmdb_loader.py:113-127).
* **Async prefetch**: a producer thread assembles batches into a bounded
  queue while the device runs the previous step (replaces
  DataLoader(num_workers=8, pin_memory=True)).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass

import numpy as np

from vlsfr_tpu.data.records import MultiSourceReader

try:
    import cv2

    cv2.setNumThreads(0)  # we manage our own thread pool
    _HAS_CV2 = True
except ImportError:  # pragma: no cover
    _HAS_CV2 = False


def _rng(*key: int) -> np.random.Generator:
    return np.random.default_rng(np.random.SeedSequence(entropy=key))


def decode_image(payload: bytes, image_size: int, reduce: int = 1) -> np.ndarray:
    """JPEG bytes → HWC uint8 (3 channels), resized to image_size.

    ``reduce`` ∈ {1, 2, 4, 8}: decode the JPEG at 1/reduce resolution
    (libjpeg DCT-domain scaling — ~reduce² cheaper). The pipelines probe the
    stored size once and pick the largest safe factor (e.g. the reference
    stores 224² but trains 112² backbones → reduce=2 halves host CPU)."""
    if not _HAS_CV2:
        raise RuntimeError("cv2 unavailable; use synthetic raw records")
    flag = {1: cv2.IMREAD_UNCHANGED, 2: cv2.IMREAD_REDUCED_COLOR_2,
            4: cv2.IMREAD_REDUCED_COLOR_4, 8: cv2.IMREAD_REDUCED_COLOR_8}[reduce]
    img = cv2.imdecode(np.frombuffer(payload, dtype=np.uint8), flag)
    if img is None:
        raise ValueError("failed to decode image payload")
    if img.ndim == 2:  # grayscale → replicate (util/lmdb_loader.py:115-119)
        img = np.stack([img] * 3, axis=-1)
    elif img.shape[-1] == 4:
        img = img[..., :3]
    if img.shape[0] != image_size or img.shape[1] != image_size:
        img = cv2.resize(img, (image_size, image_size))
    return img


def probe_decode_reduce(reader, image_size: int) -> int:
    """Pick the largest reduced-decode factor that still yields ≥ the target
    resolution, by decoding one record."""
    if not _HAS_CV2 or len(reader) == 0:
        return 1
    try:
        probe = cv2.imdecode(
            np.frombuffer(reader.payload(0), dtype=np.uint8), cv2.IMREAD_UNCHANGED
        )
        if probe is None:
            return 1
    except Exception:
        return 1
    stored = min(probe.shape[0], probe.shape[1])
    r = 1
    while r < 8 and stored // (r * 2) >= image_size:
        r *= 2
    return r


def normalize(img: np.ndarray, flip: bool) -> np.ndarray:
    """Flip + (x−127.5)/128 to float32 (util/lmdb_loader.py:113-127), HWC.

    Single fused pass: out = img·(1/128) − 127.5/128 (same constants)."""
    if flip:
        img = img[:, ::-1, :]
    out = np.multiply(img, np.float32(0.0078125), dtype=np.float32)
    out -= np.float32(127.5 * 0.0078125)
    return out


class InstanceStream:
    """Uniformly shuffled single-image index stream, one permutation per epoch.

    ``record_limit``: train only on records [0, limit) — the tail of the
    store is a HELD-OUT split for in-training verification eval."""

    def __init__(self, reader: MultiSourceReader, batch_size: int, seed: int,
                 record_limit: int | None = None):
        self.reader = reader
        self.batch_size = batch_size
        self.seed = seed
        self.n_records = record_limit if record_limit else len(reader)
        self._perm_cache: tuple[int, np.ndarray] | None = None

    def steps_per_epoch(self) -> int:
        return self.n_records // self.batch_size

    def epoch_indices(self, epoch: int) -> np.ndarray:
        # cache: one O(N) permutation per epoch, not per batch
        if self._perm_cache is None or self._perm_cache[0] != epoch:
            self._perm_cache = (epoch, _rng(self.seed, epoch, 0x1157).permutation(self.n_records))
        return self._perm_cache[1]

    def batch_indices(self, epoch: int, step: int) -> np.ndarray:
        perm = self.epoch_indices(epoch)
        lo = step * self.batch_size
        return perm[lo : lo + self.batch_size]


class PairStream:
    """Identity-pair stream: each element is an identity; two of its images
    are sampled (with duplication when it has only one,
    util/lmdb_loader.py:196-199)."""

    def __init__(self, reader: MultiSourceReader, batch_size: int, seed: int,
                 record_limit: int | None = None):
        self.reader = reader
        self.batch_size = batch_size
        self.seed = seed
        by_id = reader.labels_by_identity()
        if record_limit:
            # held-out split: drop records past the limit; identities left
            # with no training image disappear from the pair stream
            by_id = {
                i: [r for r in recs if r < record_limit] for i, recs in by_id.items()
            }
            by_id = {i: recs for i, recs in by_id.items() if recs}
        self.identities = np.asarray(list(by_id.keys()))
        self.id_records = [by_id[int(i)] for i in self.identities]
        self._perm_cache: tuple[tuple, np.ndarray] | None = None

    def steps_per_epoch(self) -> int:
        return max(len(self.identities) // self.batch_size, 1)

    def batch(self, epoch: int, step: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Returns (labels[b], rec1[b], rec2[b]) for this step. The stream
        wraps around epochs internally (the reference restarts its exhausted
        id-loader mid-epoch, main.py:42-46)."""
        b = self.batch_size
        spe = self.steps_per_epoch()
        sub_epoch, sub_step = divmod(step, spe)
        key = (epoch, sub_epoch)
        if self._perm_cache is None or self._perm_cache[0] != key:
            self._perm_cache = (
                key, _rng(self.seed, epoch, sub_epoch, 0x9A12).permutation(len(self.identities))
            )
        perm = self._perm_cache[1]
        chosen = perm[sub_step * b : sub_step * b + b]
        if len(chosen) < b:  # wrap within the tail
            extra = perm[: b - len(chosen)]
            chosen = np.concatenate([chosen, extra])
        labels = self.identities[chosen]
        rec1 = np.empty(b, dtype=np.int64)
        rec2 = np.empty(b, dtype=np.int64)
        r = _rng(self.seed, epoch, step, 0x77)  # one draw stream per batch
        for k, ident_idx in enumerate(chosen):
            recs = self.id_records[int(ident_idx)]
            n = len(recs)
            if n >= 2:
                i1 = int(r.integers(n))
                i2 = int(r.integers(n - 1))
                i2 += i2 >= i1  # distinct second pick
                rec1[k], rec2[k] = recs[i1], recs[i2]
            else:
                rec1[k] = rec2[k] = recs[0]
        return labels, rec1, rec2


@dataclass
class FFCBatch:
    """One composed FFC step batch (all host numpy, NHWC)."""

    x: np.ndarray  # [B, H, W, 3] float32
    y: np.ndarray  # [B, H, W, 3] float32
    x_label: np.ndarray  # [B] int32 (global identity labels)
    y_label: np.ndarray  # [B] int32
    epoch: int
    step: int  # step within epoch


class FFCPipeline:
    """Composes instance + pair streams into FFC batches with async prefetch.

    ``host_slice`` (multi-host DP): every host still builds the SAME global
    index/label plan per step (stateless samplers keyed on (seed, epoch,
    step) — required so the replicated host-side DCP planners stay in sync),
    but only DECODES the image rows in its slice — O(global/hosts) decode
    work per host. Labels in the returned batch remain global."""

    def __init__(
        self,
        reader: MultiSourceReader,
        batch_size: int,
        image_size: int,
        seed: int = 0,
        num_workers: int = 8,
        prefetch: int = 2,
        host_slice: slice | None = None,
        record_limit: int | None = None,
    ):
        assert batch_size % 2 == 0, "FFC batch composition needs an even batch"
        self.reader = reader
        self.batch_size = batch_size
        self.image_size = image_size
        self.seed = seed
        self.host_slice = host_slice if host_slice is not None else slice(None)
        self.instance = InstanceStream(reader, batch_size, seed, record_limit=record_limit)
        self.pairs = PairStream(reader, batch_size // 2, seed, record_limit=record_limit)
        self.pool = ThreadPoolExecutor(max_workers=num_workers)
        self.prefetch = prefetch
        self.reduce = probe_decode_reduce(reader, image_size)

    @property
    def num_class(self) -> int:
        return self.reader.num_class

    def steps_per_epoch(self) -> int:
        return self.instance.steps_per_epoch()

    # -- single-batch assembly (synchronous) ---------------------------
    def _load_one(self, rec: int, flip: bool) -> np.ndarray:
        img = decode_image(self.reader.payload(int(rec)), self.image_size, self.reduce)
        return normalize(img, flip)

    def make_batch(self, epoch: int, step: int) -> FFCBatch:
        b = self.batch_size
        half = b // 2
        ins = self.instance.batch_indices(epoch, step)
        ins_labels = np.asarray(self.reader.labels[ins])
        pair_labels, rec1, rec2 = self.pairs.batch(epoch, step)
        l1, l2 = ins_labels[:half], ins_labels[half:]

        # per-row record layout of the composed batch (reference main.py:53-60)
        x_recs = np.concatenate([rec1, ins[:half]])
        y_recs = np.concatenate([rec2, ins[half:]])
        # batch-level flip draws, keyed per (seed, epoch, step) and per side
        # so any host slice decodes identical pixels for its rows
        flips_x = _rng(self.seed, epoch, step, 0xF11).random(b) < 0.5
        flips_y = _rng(self.seed, epoch, step, 0xF13).random(b) < 0.5
        sl = self.host_slice
        imgs = list(self.pool.map(
            self._load_one,
            np.concatenate([x_recs[sl], y_recs[sl]]),
            np.concatenate([flips_x[sl], flips_y[sl]]),
        ))
        n_local = len(imgs) // 2
        return FFCBatch(
            x=np.stack(imgs[:n_local]),
            y=np.stack(imgs[n_local:]),
            x_label=np.concatenate([pair_labels, l1]).astype(np.int32),
            y_label=np.concatenate([pair_labels, l2]).astype(np.int32),
            epoch=epoch,
            step=step,
        )

    # -- async epoch iterator ------------------------------------------
    def epoch_iter(self, epoch: int, start_step: int = 0):
        """Yield FFCBatch for each step of ``epoch`` with background prefetch."""
        spe = self.steps_per_epoch()
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            for s in range(start_step, spe):
                if stop.is_set():
                    return
                q.put(self.make_batch(epoch, s))
            q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                yield item
        finally:
            stop.set()
            # drain so the producer can exit
            while t.is_alive():
                try:
                    q.get_nowait()
                except queue.Empty:
                    break

    def close(self):
        self.pool.shutdown(wait=False)


@dataclass
class InstanceBatch:
    images: np.ndarray  # [B, H, W, 3] float32
    labels: np.ndarray  # [B] int32
    epoch: int
    step: int


class InstancePipeline:
    """Plain (image, label) batches for full-softmax training and eval.

    Same determinism/prefetch machinery as FFCPipeline, single stream.
    ``host_slice``: decode only this host's image rows (labels stay global —
    see FFCPipeline).
    """

    def __init__(
        self,
        reader: MultiSourceReader,
        batch_size: int,
        image_size: int,
        seed: int = 0,
        num_workers: int = 8,
        prefetch: int = 2,
        augment: bool = True,
        host_slice: slice | None = None,
        record_limit: int | None = None,
    ):
        self.reader = reader
        self.batch_size = batch_size
        self.image_size = image_size
        self.seed = seed
        self.augment = augment
        self.host_slice = host_slice if host_slice is not None else slice(None)
        self.instance = InstanceStream(reader, batch_size, seed, record_limit=record_limit)
        self.pool = ThreadPoolExecutor(max_workers=num_workers)
        self.prefetch = prefetch
        self.reduce = probe_decode_reduce(reader, image_size)

    @property
    def num_class(self) -> int:
        return self.reader.num_class

    def steps_per_epoch(self) -> int:
        return self.instance.steps_per_epoch()

    def _load_one(self, rec: int, flip: bool) -> np.ndarray:
        img = decode_image(self.reader.payload(int(rec)), self.image_size, self.reduce)
        return normalize(img, flip)

    def make_batch(self, epoch: int, step: int) -> InstanceBatch:
        idx = self.instance.batch_indices(epoch, step)
        labels = np.asarray(self.reader.labels[idx], dtype=np.int32)
        if self.augment:
            flips = _rng(self.seed, epoch, step, 0xF12).random(len(idx)) < 0.5
        else:
            flips = np.zeros(len(idx), dtype=bool)
        sl = self.host_slice
        imgs = list(self.pool.map(self._load_one, idx[sl], flips[sl]))
        return InstanceBatch(images=np.stack(imgs), labels=labels, epoch=epoch, step=step)

    def epoch_iter(self, epoch: int, start_step: int = 0):
        spe = self.steps_per_epoch()
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            for s in range(start_step, spe):
                if stop.is_set():
                    return
                q.put(self.make_batch(epoch, s))
            q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                yield item
        finally:
            stop.set()
            while t.is_alive():
                try:
                    q.get_nowait()
                except queue.Empty:
                    break

    def close(self):
        self.pool.shutdown(wait=False)
