"""Embedding extraction: the de-facto inference surface.

The reference never ships an inference/eval path (SURVEY.md §3.5: its test
chapter is an empty stub; the implied surface is ``probe_net(image) →
512-d normalized embedding`` from the checkpoint at main.py:85). This module
makes that surface real: batched jit'd extraction with optional
flip-averaged (test-time augmentation) embeddings, padding the tail batch so
one compilation serves any dataset size.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from vlsfr_tpu.models.layers import l2_normalize


class Embedder:
    def __init__(self, model, variables, batch_size: int = 64, flip_average: bool = True):
        """``variables`` = {"params": ..., "batch_stats": ...} of a backbone."""
        self.model = model
        self.variables = variables
        self.batch_size = batch_size
        self.flip_average = flip_average

        def forward(images):
            emb = model.apply(variables, images, train=False)
            if flip_average:
                emb2 = model.apply(variables, images[:, :, ::-1, :], train=False)
                emb = l2_normalize(emb + emb2)
            return emb

        self._fn = jax.jit(forward)

    def __call__(self, images: np.ndarray) -> np.ndarray:
        """[N, H, W, 3] float32 (normalized pixels) → [N, D] fp32 embeddings."""
        n = images.shape[0]
        out = []
        for lo in range(0, n, self.batch_size):
            chunk = images[lo : lo + self.batch_size]
            pad = self.batch_size - chunk.shape[0]
            if pad:
                chunk = np.concatenate([chunk, np.zeros((pad, *chunk.shape[1:]), chunk.dtype)])
            emb = np.asarray(self._fn(jnp.asarray(chunk)))
            out.append(emb[: self.batch_size - pad] if pad else emb)
        return np.concatenate(out) if out else np.zeros((0, 0), np.float32)

    def from_reader(self, reader, image_size: int, indices=None) -> np.ndarray:
        """Extract embeddings for records of a store (no augmentation)."""
        from vlsfr_tpu.data.pipeline import decode_image, normalize

        idx = range(len(reader)) if indices is None else indices
        imgs = np.stack(
            [normalize(decode_image(reader.payload(int(i)), image_size), False) for i in idx]
        )
        return self(imgs)
