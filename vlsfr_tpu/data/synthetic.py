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
    hard: bool = False,
    coef_jitter: float = 0.0,
) -> str:
    """``hard=False``: each identity is a distinct low-frequency pattern —
    trivially separable (good for mechanics tests; even a random backbone
    verifies at ~1.0). ``hard=True``: identities are small perturbations of a
    shared "face manifold" (a few global basis patterns mixed with
    identity-specific coefficients close to a common mean) plus strong
    per-image jitter — inter-identity distances are small, so verification
    accuracy actually measures learned discrimination.

    ``coef_jitter`` (hard mode only) adds per-IMAGE noise in the same
    k-dim basis-coefficient space that carries the identity signal. Unlike
    pixel noise (which a 112x112 embedding averages out over ~37k pixels
    per basis dim), in-manifold jitter is indistinguishable from identity
    variation, so it sets a Bayes-OPTIMAL verification ceiling no training
    budget can exceed — the dial that makes the accuracy study
    discriminative. Monte-Carlo ceiling vs jitter (k=8, id_spread=0.5,
    cosine observable, optimal threshold): 0.10->0.992, 0.15->0.974,
    0.20->0.942, 0.25->0.907, 0.30->0.868. The study uses 0.20."""
    import cv2

    rng = np.random.default_rng(seed)
    if hard:
        k = 8  # shared basis patterns
        basis = rng.uniform(-1, 1, size=(k, 8, 8, 3)).astype(np.float32)
        mean_coef = rng.uniform(-1, 1, size=k).astype(np.float32)
        id_spread = 0.5  # identity signal vs shared mean

        def render(coef):
            low = np.tensordot(coef, basis, axes=1)
            low = 127.5 + 60.0 * low / max(np.abs(low).max(), 1e-6)
            return cv2.resize(low, (image_size, image_size),
                              interpolation=cv2.INTER_CUBIC)

    with FaceRecordWriter(directory) as w:
        for ident in range(num_ids):
            if hard:
                coef = mean_coef + id_spread * rng.standard_normal(k).astype(np.float32)
                base = render(coef)
            else:
                low = rng.uniform(0, 255, size=(8, 8, 3)).astype(np.float32)
                base = cv2.resize(low, (image_size, image_size),
                                  interpolation=cv2.INTER_CUBIC)
            for j in range(images_per_id):
                if hard:
                    if coef_jitter > 0.0:
                        img = render(coef + coef_jitter
                                     * rng.standard_normal(k).astype(np.float32))
                    else:
                        img = base.copy()
                    # per-image nuisance: brightness, contrast, noise
                    img = img * rng.uniform(0.9, 1.1) + rng.uniform(-12, 12)
                    img = img + rng.normal(0, 10, size=img.shape)
                else:
                    img = base.copy()
                    img = img + rng.normal(0, 12, size=img.shape) + rng.uniform(-20, 20)
                img = np.clip(img, 0, 255).astype(np.uint8)
                ok, buf = cv2.imencode(".jpg", img, [cv2.IMWRITE_JPEG_QUALITY, 92])
                assert ok
                # key format mirrors the reference ('{db}_{label}_{j}',
                # creat_lmdb.py:62)
                w.add(f"{db_name}_{ident}_{j}", ident, buf.tobytes())
    return directory
