"""Gallery index for large-scale 1:N identification (serving path).

Not present in the reference (no inference surface at all, SURVEY.md §3.5)
— but "very large scale" identification is the deployment story the
reference's 10M-identity training exists for, so the index is built to the
same scale discipline as the training head:

* **Streaming tiled search.** Cosine scores are computed tile-by-tile over
  the gallery rows with a running top-k carry (``lax.scan``), so the
  [Q, G] similarity matrix never exists in HBM — the same access pattern
  as the streaming softmax forward (ops/margin_pallas.py). A 10M-row
  search touches each gallery byte exactly once.
* **approx_max_k per tile** (``recall_target``, default 0.95): the
  per-tile reduction is ``jax.lax.approx_max_k`` — the TPU PartialReduce
  op built for exactly this MIPS shape — then an exact merge of the 2k
  candidates. Measured on one v5e (tools/bench_search_variants.py,
  G=1M bf16): 1.42 ms vs 6.40 ms for exact ``lax.top_k`` per tile —
  **754 GB/s, 92% of HBM roofline** vs 168 GB/s sort-bound, at measured
  recall@10 = 1.0000 on normalized embeddings. ``recall_target >= 1.0``
  selects the exact sort-based path (``approx_max_k(recall_target=1.0)``
  itself lowers to the slow sort — measured, don't use it for exact).
* **Int8 gallery storage** (``int8=True``): rows are stored as symmetric
  per-row int8 + f32 scale, dequantized inside the tile read. The win is
  CAPACITY — 2× rows per chip (10M × 512 int8 ≈ 5.4 GB incl. scales; a
  10M-row search runs on ONE v5e) — not speed: measured end-to-end the
  int8 search times within ±7% of bf16 (docs/PERF.md round 3 — with the
  approx_max_k reduction the Q=128 search sits near the MXU floor, and
  the XLA-side dequant costs what the halved read saves; the 1.37-1.45×
  classifier-study figure needed the dequant fused into a Pallas kernel).
  Cosine scores drift ≤ ~1e-2 absolute; ranking on separated identities
  is unchanged (tests/test_eval.py).
* **Mesh sharding** (``mesh=``): gallery rows are sharded over the
  ``model`` axis; each shard streams its local tiles and emits its local
  top-k, merged with one global top-k over the m·k candidates — the
  serving-side analogue of the partial-FC class-axis layout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P


def _quantize_rows(g: np.ndarray):
    """[G, D] float rows -> (int8 rows, f32 per-row scale)."""
    absmax = np.abs(g).max(axis=-1)
    scale = np.maximum(absmax, 1e-12) / 127.0
    q = np.clip(np.round(g / scale[:, None]), -127, 127).astype(np.int8)
    return q, scale.astype(np.float32)


class FaceIndex:
    """Append-then-search cosine index over L2-normalized embeddings.

    Args:
      feat_dim: embedding dimension.
      mesh: optional ``jax.sharding.Mesh`` with a ``model`` axis; gallery
        rows are sharded over it.
      int8: store the gallery int8 + per-row scale (half the bytes of
        bf16, quarter of f32; dequant fused into the tile read).
      tile: gallery rows scored per scan step (VMEM working set is
        ``tile × feat_dim`` plus the [Q, tile] score block).
      compute_dtype: matmul operand dtype. bf16 (default) = MXU rate on
        TPU, f32 accumulation. ``jnp.int8`` (requires ``int8=True``)
        additionally quantizes the queries and scores int8×int8→int32 at
        2× the bf16 MXU rate on v5e — the big-Q lever once the search is
        matmul-bound (Q=1024 at G=10M measured 0.92 MXU in bf16).
      recall_target: per-tile top-k recall for ``jax.lax.approx_max_k``
        (4.5× faster than exact at 1M rows — module docstring); values
        >= 1.0 select the exact sort-based ``lax.top_k`` per tile.
    """

    def __init__(self, feat_dim: int, mesh=None, int8: bool = False,
                 tile: int = 65536, compute_dtype=jnp.bfloat16,
                 recall_target: float = 0.95):
        if jnp.dtype(compute_dtype) == jnp.int8 and not int8:
            raise ValueError("compute_dtype=int8 requires int8=True "
                             "(the gallery must be stored quantized)")
        self.feat_dim = feat_dim
        self.mesh = mesh
        self.int8 = int8
        self.tile = tile
        self.compute_dtype = compute_dtype
        self.recall_target = recall_target
        self._embs: list[np.ndarray] = []
        self._labels: list[np.ndarray] = []
        self._gallery = None
        self._scales = None
        self._gallery_labels = None
        self._n_rows = 0
        self._search = None
        self._search_unbound = None

    @classmethod
    def from_arrays(cls, gallery, labels, scales=None, *, mesh=None,
                    tile: int = 65536, compute_dtype=jnp.bfloat16,
                    recall_target: float = 0.95) -> "FaceIndex":
        """Wrap a PREBUILT gallery (quantized offline, restored from a
        checkpoint, or already resident on device) without the
        add()/_build() host concatenate + re-quantize round-trip.

        Args:
          gallery: [G, D] rows. With ``scales``: int8 rows used verbatim
            (int8 storage mode). Without: float rows, assumed
            L2-normalized, stored as ``compute_dtype``.
          labels: [G] integer identity labels.
          scales: optional [G] f32 per-row dequant scales (row ≈
            scale · int8_row) — selects int8 storage.
          mesh/tile/compute_dtype/recall_target: as in ``__init__``.

        Accepts numpy or device arrays; rows are padded to a tile multiple
        (padding is masked out of every search by the global-row-id test).
        """
        int8 = scales is not None
        g_rows, d = gallery.shape
        self = cls(feat_dim=d, mesh=mesh, int8=int8, tile=tile,
                   compute_dtype=compute_dtype, recall_target=recall_target)
        if int8 and np.dtype(gallery.dtype) != np.int8:
            raise ValueError("scales given but gallery dtype is "
                             f"{gallery.dtype}, expected int8")
        m = mesh.shape["model"] if mesh is not None else 1
        tile = max(128, min(tile, -(-max(g_rows, 1) // (128 * m)) * 128))
        pad = (-g_rows) % (tile * m)
        if pad:
            # numpy galleries pad on host (the mesh path must not stage
            # the full array on device 0 — see _build); device galleries
            # pad in place on device
            xp = np if isinstance(gallery, np.ndarray) else jnp
            gallery = xp.concatenate(
                [gallery, xp.zeros((pad, d), gallery.dtype)])
            if int8:
                scales = xp.concatenate(
                    [xp.asarray(scales, np.float32), xp.ones(pad, np.float32)])
        if not int8:
            gallery = gallery.astype(np.dtype(compute_dtype))
        if mesh is not None:
            gallery = jax.device_put(gallery, NamedSharding(mesh, P("model", None)))
            if int8:
                scales = jax.device_put(scales, NamedSharding(mesh, P("model")))
        else:
            gallery = jnp.asarray(gallery)
            scales = jnp.asarray(scales) if int8 else None
        self._gallery = gallery
        self._scales = scales if int8 else None
        self._gallery_labels = np.asarray(labels, np.int64)
        self._n_rows = g_rows
        self._search_unbound = self._make_search(tile)
        self._search = functools.partial(
            self._search_unbound, gallery, self._scales)
        return self

    @property
    def gallery(self):
        """Built device gallery rows (padded to a tile multiple)."""
        if self._gallery is None:
            self._build()
        return self._gallery

    @property
    def row_scales(self):
        """Per-row int8 dequant scales (None for float galleries)."""
        if self._gallery is None:
            self._build()
        return self._scales

    def search_fn(self):
        """The jitted ``(gallery, scales, queries, k) -> (vals, idx)``
        function backing search() — for benchmark harnesses that must
        perturb operands inside a jit chain (utils/benchtime)."""
        if self._gallery is None:
            self._build()
        return self._search_unbound

    def add(self, embeddings: np.ndarray, labels: np.ndarray) -> None:
        assert embeddings.shape[1] == self.feat_dim
        e = embeddings / np.maximum(
            np.linalg.norm(embeddings, axis=-1, keepdims=True), 1e-12)
        self._embs.append(e.astype(np.float32))
        self._labels.append(np.asarray(labels, np.int64))
        self._gallery = None  # invalidate

    def __len__(self) -> int:
        return sum(len(x) for x in self._labels)

    def nbytes(self) -> int:
        """Device bytes the built gallery occupies (capacity planning)."""
        if self._gallery is None:
            self._build()
        n = self._gallery.size * self._gallery.dtype.itemsize
        if self._scales is not None:
            n += self._scales.size * self._scales.dtype.itemsize
        return n

    def _build(self):
        g = (np.concatenate(self._embs) if self._embs
             else np.zeros((0, self.feat_dim), np.float32))
        self._gallery_labels = (
            np.concatenate(self._labels) if self._labels else np.zeros(0, np.int64))
        self._n_rows = g.shape[0]
        m = self.mesh.shape["model"] if self.mesh is not None else 1
        tile = max(128, min(self.tile, -(-max(self._n_rows, 1) // (128 * m)) * 128))
        pad = (-g.shape[0]) % (tile * m)
        if pad:
            g = np.concatenate([g, np.zeros((pad, self.feat_dim), np.float32)])
        # convert on HOST, then device_put with the target sharding in one
        # hop: jnp.asarray first would stage the FULL gallery on device 0
        # and only then reshard — an OOM at exactly the over-one-chip
        # gallery sizes the mesh path exists for
        if self.int8:
            gallery_np, scales_np = _quantize_rows(g)
        else:
            gallery_np = g.astype(np.dtype(self.compute_dtype))
            scales_np = None
        if self.mesh is not None:
            rows = NamedSharding(self.mesh, P("model", None))
            gallery = jax.device_put(gallery_np, rows)
            scales = (jax.device_put(
                scales_np, NamedSharding(self.mesh, P("model")))
                if scales_np is not None else None)
        else:
            gallery = jnp.asarray(gallery_np)
            scales = jnp.asarray(scales_np) if scales_np is not None else None
        self._gallery = gallery
        self._scales = scales
        self._search_unbound = self._make_search(tile)
        self._search = functools.partial(self._search_unbound, gallery, scales)

    def _make_search(self, tile: int):
        cd, int8, n_rows = self.compute_dtype, self.int8, self._n_rows
        mesh, D = self.mesh, self.feat_dim
        rt = self.recall_target
        # compute_dtype=int8 (requires int8 storage): quantize the QUERIES
        # too and run the scoring matmul int8×int8→int32 — 2× the bf16 MXU
        # rate on v5e — rescaling scores by the (q_scale ⊗ row_scale)
        # broadcast product. Drift is the same ~1e-2 class as int8 storage.
        int8c = int8 and jnp.dtype(cd) == jnp.int8

        def _prep(queries):
            """-> (matmul-ready queries, per-row query scale | None)."""
            if not int8c:
                return queries.astype(cd), None
            qs = jnp.maximum(jnp.max(jnp.abs(queries), -1), 1e-12) / 127.0
            qi = jnp.clip(jnp.round(queries / qs[:, None]),
                          -127, 127).astype(jnp.int8)
            return qi, qs.astype(jnp.float32)

        def stream(q, qscale, g, s, row0, k, vary=False):
            """Running top-k over local gallery tiles; [Q, G_local] never
            materializes. Rows with global id >= n_rows are padding."""
            n_t = g.shape[0] // tile
            gt = g.reshape(n_t, tile, D)
            xs = (jnp.arange(n_t), gt, s.reshape(n_t, tile)) if int8 else (
                jnp.arange(n_t), gt)

            def body(carry, xs_i):
                vals, idx = carry
                i, t = xs_i[0], xs_i[1]
                if int8c:
                    zi = jnp.dot(q, t.T, preferred_element_type=jnp.int32)
                    z = (zi.astype(jnp.float32)
                         * qscale[:, None] * xs_i[2][None, :])
                else:
                    w = t.astype(cd)
                    if int8:
                        w = w * xs_i[2][:, None].astype(cd)
                    z = jnp.dot(q, w.T, preferred_element_type=jnp.float32)
                gid = row0 + i * tile + jnp.arange(tile, dtype=jnp.int32)
                z = jnp.where(gid[None, :] < n_rows, z, -1e30)
                if rt < 1.0 and k * 8 <= tile:
                    # PartialReduce per tile (92% of HBM roofline — module
                    # docstring), exact merge of the 2k candidates below
                    tv, tp = jax.lax.approx_max_k(z, k, recall_target=rt)
                elif k < tile:
                    tv, tp = jax.lax.top_k(z, k)
                else:  # k >= tile rows: every tile column is a candidate
                    tv, tp = z, jnp.broadcast_to(
                        jnp.arange(tile, dtype=jnp.int32), z.shape)
                cand_v = jnp.concatenate([vals, tv], axis=1)
                cand_i = jnp.concatenate([idx, gid[tp]], axis=1)
                v, pos = jax.lax.top_k(cand_v, k)
                return (v, jnp.take_along_axis(cand_i, pos, axis=1)), None

            init = (jnp.full((q.shape[0], k), -1e30, jnp.float32),
                    jnp.full((q.shape[0], k), -1, jnp.int32))
            if vary:  # inside shard_map the carry varies over the model axis
                init = jax.lax.pcast(init, ("model",), to="varying")
            (vals, idx), _ = jax.lax.scan(body, init, xs)
            return vals, idx

        if mesh is None:
            def search(g, s, queries, k):
                q, qsc = _prep(queries)
                return stream(q, qsc, g, s, jnp.int32(0), k)
            return jax.jit(search, static_argnums=3)

        def search(g, s, queries, k):
            q, qsc = _prep(queries)

            def shard_body(q, g, *rest):
                row0 = (jax.lax.axis_index("model") * g.shape[0]).astype(jnp.int32)
                vals, idx = stream(q, rest[1] if int8c else None, g,
                                   rest[0] if int8 else None, row0, k,
                                   vary=True)
                return vals[None], idx[None]

            in_specs = (P(None, None), P("model", None)) + (
                (P("model"),) if int8 else ()) + ((P(None),) if int8c else ())
            vals_m, idx_m = jax.shard_map(
                shard_body, mesh=mesh, in_specs=in_specs,
                out_specs=(P("model", None, None), P("model", None, None)),
            )(q, g, *(((s,) if int8 else ()) + ((qsc,) if int8c else ())))
            # [m, Q, k] -> global top-k over the m·k per-shard candidates
            allv = jnp.swapaxes(vals_m, 0, 1).reshape(queries.shape[0], -1)
            alli = jnp.swapaxes(idx_m, 0, 1).reshape(queries.shape[0], -1)
            v, pos = jax.lax.top_k(allv, k)
            return v, jnp.take_along_axis(alli, pos, axis=1)

        return jax.jit(search, static_argnums=3)

    def search(self, queries: np.ndarray, k: int = 1):
        """Returns (scores [Q,k], gallery_row [Q,k], labels [Q,k]);
        row/label are -1 for slots beyond the gallery size."""
        if self._gallery is None:
            self._build()
        q = queries / np.maximum(
            np.linalg.norm(queries, axis=-1, keepdims=True), 1e-12)
        if self._n_rows == 0:
            z = np.full((len(q), k), -1, np.int64)
            return np.full((len(q), k), -np.inf, np.float32), z, z
        vals, idx = self._search(jnp.asarray(q, np.float32), k)
        vals, idx = np.asarray(vals), np.asarray(idx).astype(np.int64)
        valid = idx >= 0
        labels = np.where(
            valid, self._gallery_labels[np.maximum(idx, 0)], -1)
        return np.where(valid, vals, -np.inf), np.where(valid, idx, -1), labels

    def identify(self, queries: np.ndarray, threshold: float = 0.0) -> np.ndarray:
        """Top-1 label per query, -1 when below the accept threshold."""
        vals, _, labels = self.search(queries, k=1)
        return np.where(vals[:, 0] >= threshold, labels[:, 0], -1)
