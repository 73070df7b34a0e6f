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
    def __init__(self, model, variables, batch_size: int = 64,
                 flip_average: bool = True, int8: bool = False):
        """``variables`` = {"params": ..., "batch_stats": ...} of a backbone.

        ``int8`` serves the forward with int8×int8→int32 convs
        (ops/quant.py — per-channel weights, dynamic per-tensor
        activations): 1.5-3.6× conv throughput on v5e at a measured
        embedding drift inside the 0.999 cosine gate (docs/PERF.md)."""
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

        if int8:
            from vlsfr_tpu.ops.quant import int8_conv_inference

            def forward_traced(images, _inner=forward):
                with int8_conv_inference():
                    return _inner(images)
            self._fn = jax.jit(forward_traced)
        else:
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
