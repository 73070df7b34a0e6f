"""Synthetic identity dataset generator (BASELINE config 1's CPU-runnable
10k-ID dataset; the reference has no equivalent — its tooling assumes a real
folder-of-images tree, data/creat_lmdb.py:45-70).

Each identity gets a smooth random base pattern; each of its images is the
base plus small noise + a random brightness shift, JPEG-encoded into a
FaceRecordWriter store. Deterministic given (seed, num_ids, images_per_id).
"""

from __future__ import annotations

import numpy as np

from vlsfr_tpu.data.records import FaceRecordWriter


def generate_synthetic_store(
    directory: str,
    num_ids: int = 10,
    images_per_id: int = 4,
    image_size: int = 112,
    seed: int = 0,
    db_name: str = "syn",
) -> str:
    import cv2

    rng = np.random.default_rng(seed)
    with FaceRecordWriter(directory) as w:
        for ident in range(num_ids):
            # low-frequency base pattern per identity
            low = rng.uniform(0, 255, size=(8, 8, 3)).astype(np.float32)
            base = cv2.resize(low, (image_size, image_size), interpolation=cv2.INTER_CUBIC)
            for j in range(images_per_id):
                img = base + rng.normal(0, 12, size=base.shape) + rng.uniform(-20, 20)
                img = np.clip(img, 0, 255).astype(np.uint8)
                ok, buf = cv2.imencode(".jpg", img, [cv2.IMWRITE_JPEG_QUALITY, 92])
                assert ok
                # key format mirrors the reference ('{db}_{label}_{j}',
                # creat_lmdb.py:62)
                w.add(f"{db_name}_{ident}_{j}", ident, buf.tobytes())
    return directory
