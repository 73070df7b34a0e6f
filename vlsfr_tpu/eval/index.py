"""Gallery index for large-scale 1:N identification (serving path).

Not present in the reference (no inference surface at all, SURVEY.md §3.5).
Cosine-similarity search over an embedding gallery as one MXU matmul +
top-k, optionally sharded over the mesh ``model`` axis for galleries that
exceed one chip's HBM (the serving-side analogue of the partial-FC layout:
each shard scores its slice, a global top-k merges candidates).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P


class FaceIndex:
    """Append-then-search cosine index over L2-normalized embeddings."""

    def __init__(self, feat_dim: int, mesh=None, batch_k: int = 10):
        self.feat_dim = feat_dim
        self.mesh = mesh
        self._embs: list[np.ndarray] = []
        self._labels: list[np.ndarray] = []
        self._gallery = None
        self._gallery_labels = None
        self._search = None
        self.batch_k = batch_k

    def add(self, embeddings: np.ndarray, labels: np.ndarray) -> None:
        assert embeddings.shape[1] == self.feat_dim
        e = embeddings / np.maximum(np.linalg.norm(embeddings, axis=-1, keepdims=True), 1e-12)
        self._embs.append(e.astype(np.float32))
        self._labels.append(np.asarray(labels, np.int64))
        self._gallery = None  # invalidate

    def __len__(self) -> int:
        return sum(len(x) for x in self._labels)

    def _build(self):
        gallery = np.concatenate(self._embs) if self._embs else np.zeros((0, self.feat_dim), np.float32)
        self._gallery_labels = (
            np.concatenate(self._labels) if self._labels else np.zeros(0, np.int64)
        )
        g = jnp.asarray(gallery)
        if self.mesh is not None:
            # pad to a multiple of the model-axis size, shard rows over it
            m = self.mesh.shape["model"]
            pad = (-g.shape[0]) % m
            if pad:
                g = jnp.concatenate([g, jnp.zeros((pad, self.feat_dim), g.dtype)])
            g = jax.device_put(g, NamedSharding(self.mesh, P("model", None)))
        self._gallery = g

        def search(queries, k):
            sims = jnp.einsum("qd,gd->qg", queries, self._gallery,
                              preferred_element_type=jnp.float32)
            if self.mesh is not None:
                sims = jax.lax.with_sharding_constraint(
                    sims, NamedSharding(self.mesh, P(None, "model"))
                )
            vals, idx = jax.lax.top_k(sims, k)
            return vals, idx

        self._search = jax.jit(search, static_argnums=1)

    def search(self, queries: np.ndarray, k: int = 1) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Returns (scores [Q,k], gallery_row [Q,k], labels [Q,k])."""
        if self._gallery is None:
            self._build()
        q = queries / np.maximum(np.linalg.norm(queries, axis=-1, keepdims=True), 1e-12)
        vals, idx = self._search(jnp.asarray(q, jnp.float32), k)
        vals, idx = np.asarray(vals), np.asarray(idx)
        idx_clipped = np.minimum(idx, len(self._gallery_labels) - 1)
        labels = self._gallery_labels[idx_clipped]
        # padded rows (if any) have zero vectors: score 0; mark label -1
        labels = np.where(idx < len(self._gallery_labels), labels, -1)
        return vals, idx, labels

    def identify(self, queries: np.ndarray, threshold: float = 0.0) -> np.ndarray:
        """Top-1 label per query, -1 when below the accept threshold."""
        vals, _, labels = self.search(queries, k=1)
        return np.where(vals[:, 0] >= threshold, labels[:, 0], -1)
