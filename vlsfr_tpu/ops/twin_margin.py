"""Twin-view fused margin loss for the FFC head.

The FFC directional loss (reference ffc.py:180-202; core/ffc.py
``directional_loss``) scores the probe embeddings against TWO views of the
post-write queue: row 0, and the parity blend (slots hit this step read
row 1). The naive composition at a multi-million-slot queue is
HBM-catastrophic — at Q=1M f32 the measured head cost is ~114 ms/step:

    scatter A:  copy the whole [2, Q, D] queue to write B rows (discarded!)
    scatter B:  another full copy (persisted)
    blend:      read q0 + q1 + WRITE a [Q, D] blended copy  (per direction)
    views:      the streaming kernels read q0 and the blend  (per direction)
    backward:   re-reads everything

This kernel fuses one DIRECTION's entire head into two passes over q0
tiles: the step's queue writes are applied IN-VMEM — for each tile column
the last (highest batch index) matching write wins, exactly the
reference's sequential mutation semantics (ffc.py:160-176) — and the blend
mask is rebuilt per column from (cols, seen). q1 is NEVER streamed: view 2
differs from view 1 only at this step's ≤B written slots, whose values are
a B-row gather of q1 combined with the write plan (``twin_write_values``).
No scatter, no blended copy, no queue gradient (the queue is a
stop-gradient constant):

    forward:  read q0 once + B rows of q1
    backward: read q0 once + B rows of q1, d_emb accumulated in VMEM

Clean tiles (no written slot in range — ~all of them at Q ≫ B) are
additionally predicated down to a single cosine MXU dot per pass.

Equivalence to the unfused composition (scatter → blend → two
``fused_add_margin`` calls) is tested in tests/test_twin_margin.py, and
core/ffc.py routes through here for the single-shard fused path, with the
direction-B persistence scatter done once outside the loss.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vlsfr_tpu.ops.margin_pallas import (
    KTH_TIE_TOL,
    NEG_INF,
    _fit_tile,
    _mxu_pair,
    _pad_classes,
    _phi_prime,
    _phi_target,
    _tile_modified,
)


def _zero_cot(x):
    """Zero cotangent matching a custom_vjp primal: float0 for integer
    primals (an int8-stored queue), zeros_like for floats."""
    if jnp.issubdtype(x.dtype, jnp.floating):
        return jnp.zeros_like(x)
    import numpy as np

    return np.zeros(x.shape, jax.dtypes.float0)


def _splice_optional(body, n_lead, *, int8c, int8):
    """Adapt a canonical quad-kernel body — whose signature after the
    ``n_lead`` leading refs is ``(e8A, seA, e8B, seB, w0_ref, s0_ref,
    *rest)`` — to the actual pallas operand list, which only contains the
    int8-compute probe refs when ``int8c`` and the storage-scales ref when
    ``int8``. Missing groups are spliced in as None."""
    if int8c and int8:
        return body

    def kernel(*refs):
        rest = list(refs[n_lead:])
        args = list(refs[:n_lead])
        if int8c:
            args += rest[:4]
            rest = rest[4:]
        else:
            args += [None, None, None, None]
        args.append(rest.pop(0))  # w0_ref
        args.append(rest.pop(0) if int8 else None)  # s0_ref
        return body(*args, *rest)

    return kernel


def twin_write_values(q1_rows, g32, rows_i, cols_i, seen_f):
    """Per-write blended-view values — q1 is NEVER streamed through tiles:
    view 2 differs from view 1 only at this step's ≤B written slots, whose
    values are w1_eff[col] = g[last parity-1 writer] if one exists, else
    q1[col]. ``q1_rows`` [B, D] is the caller's gather of q1 at ``cols``
    (a row shard gathers only its local range; out-of-range rows may be
    garbage — they are never selected because no local column matches).
    Returns (v [B, D] f32, blend_b [B] int32 — whether the entry's slot is
    in the blend set, i.e. any same-slot write has seen > 0). Entries
    sharing a slot get identical (v, blend_b), so a last-occurrence
    one-hot per tile column selects a consistent value."""
    b = cols_i.shape[0]
    same = cols_i[:, None] == cols_i[None, :]  # [B, B]
    i_iota = jnp.arange(b, dtype=jnp.int32)
    win1 = jnp.max(jnp.where(same & (rows_i[None, :] == 1),
                             i_iota[None, :], -1), axis=1)
    v = jnp.where(win1[:, None] >= 0, g32[jnp.maximum(win1, 0)],
                  q1_rows.astype(jnp.float32))
    blend_b = jnp.max(jnp.where(same & (seen_f[None, :] > 0), 1, 0), axis=1)
    return v, blend_b


def effective_tile_views(w0, col_ids, g, rows, cols, v, blend_b, mxu_bf16=False):
    """Tile effective views from the write plan alone (no q1 tile): view 1 =
    q0 with parity-0 overrides; view 2 = view 1 with blend-set columns
    replaced by their precomputed ``v`` rows (twin_write_values).

    Same Mosaic-safe [T, B] layout rules as ``_effective_views`` (which it
    replaces on the streaming paths — that one needs the q1 tile and
    remains for the B-row label gathers)."""
    t = w0.shape[0]
    b = cols.shape[0]
    match = col_ids[:, None] == cols[None, :]  # [T, B]
    i_io = jax.lax.broadcasted_iota(jnp.int32, (t, b), 1)

    def onehot_last(hit):
        last = jnp.max(jnp.where(hit, i_io, -1), axis=1, keepdims=True)
        oh = (hit & (i_io == last)).astype(jnp.float32)
        return oh, last

    oh0, last0 = onehot_last(match & (rows[None, :] == 0))
    oh0_op, g_op = _mxu_pair(oh0, g, mxu_bf16)
    w0e = jnp.where(last0 >= 0,
                    jnp.dot(oh0_op, g_op, preferred_element_type=jnp.float32), w0)
    ohb, lastb = onehot_last(match & (blend_b[None, :] > 0))
    ohb_op, v_op = _mxu_pair(ohb, v, mxu_bf16)
    wbe = jnp.where(lastb >= 0,
                    jnp.dot(ohb_op, v_op, preferred_element_type=jnp.float32), w0e)
    return w0e, wbe


# Fixed-reference negative stream (docs/PERF.md round-3 session 5): every
# z = scale·cos of unit-norm rows is ≤ scale (+ f32 fuzz), so the Arc/AM
# shared negative stream can use the CONSTANT reference ``scale`` instead
# of a running max: s += Σ exp(z − scale), logz_neg = scale + log s. That
# deletes the per-tile max/rescale bookkeeping, and the stream runs
# entirely in z-units — the top-k buffers hold z = scale·cos (monotonic;
# converted once at finalize, exactly for power-of-two scales) so the
# unscaled cosine never materializes as a second [B, T] array. Underflow
# bound: the smallest term is exp(−2·scale) ≥ f32 min normal (e^−87.3)
# for scale ≤ 40 — above that the running-max bodies stay in charge.
_FIXED_REF_MAX_SCALE = 40.0
# z-unit stand-in for the backward's strict (cos > 0) hard-negative test:
# zm ≥ max(scale·(kth − TOL), _Z_POS_TINY) folds the two comparisons into
# one; the boundary moves from cos > 0 to cos ≥ 1e-20/scale (measure-zero
# inside the KTH_TIE_TOL fuzz).
_Z_POS_TINY = 1e-20
# PERF-BISECT ONLY (tools/bench_head_bisect.py): comma-set of clean-tile
# epilogue stages to stub out of the shared-stream forward so their cost
# can be measured by difference on the real chip — per-op profilers see a
# Pallas kernel as ONE opaque custom call, so intra-kernel decomposition
# needs compiled ablation variants. Values: "topk" (skip the running
# top-k needs/merge), "exp" (identity for the softmax exp), "mask" (skip
# the neg_ok where), "deq" (skip the int8-compute post-dot dequant
# multiply). Read ONCE at import; NEVER set in training — ablated kernels
# compute wrong losses by construction.
_ABLATE = frozenset(
    filter(None, os.environ.get("VLSFR_HEAD_ABLATE", "").split(",")))
# Both-directions-stacked clean-tile fast path for the quad kernels:
# one [2B, tile] cosine dot per clean tile instead of two [B, tile]
# dots — doubles the MXU M-extent (amortizing the systolic fill /
# weight-load of each 128x128 block over twice the activation rows) and
# halves the per-op issue count of the epilogue. Row-wise ops ⇒ outputs
# bit-identical to the per-direction bodies
# (tests/test_twin_margin.py::test_quad_stacked_matches).
#
# Round-5 step-level A/Bs (docs/PERF.md "Stacked clean-tile"): int8-
# compute +5.2% (capacity row 1557→1638 img/s). FLOAT tiles initially
# fell off a cliff (q1M f32: 2176→3 img/s) — that was the PRE-probe
# full [2B, tile] merge extraction wrecking the f32 Mosaic schedule;
# with the two-stage probe (_merge_tile_topk) the same config reads
# 2190.81 vs 2170.39 off (+0.9%, docs/logs/r5_f32_stacked_recheck.log).
# Default "auto" = stacked on the int8-compute and float-tile paths
# (both step-measured); the int8-STORAGE bf16-dot path (s_lane) keeps
# per-direction bodies — never step-measured stacked, and the f32
# incident says unmeasured schedule changes can be catastrophic.
# VLSFR_QUAD_STACKED=1/0 forces either way (bench A/B override).
_STACKED_ENV = os.environ.get("VLSFR_QUAD_STACKED", "auto")
_STACKED = _STACKED_ENV == "1"        # forced on for every tile dtype
_STACKED_AUTO = _STACKED_ENV == "auto"  # on for int8-compute/float tiles


def _topk_rows(buf, k):
    """Top-k values per row of ``buf`` [b, w] by k max+argmax passes (no
    sort on the VPU; w is tile-sized or a few k)."""
    b, w = buf.shape
    buf_col = jax.lax.broadcasted_iota(jnp.int32, (b, w), 1)
    out = []
    for _ in range(k):
        vmax = jnp.max(buf, axis=-1, keepdims=True)
        amax = jnp.argmax(buf, axis=-1)[:, None]
        out.append(vmax)
        buf = jnp.where(buf_col == amax, NEG_INF, buf)
    return jnp.concatenate(out, axis=-1)


def _merge_tile_topk(zm, kth, topk_scrs, k, probe_m=2):
    """Fold one [b, tile] masked-z tile into each [b, k] top-k scratch,
    EXACTLY, with a cheap candidate probe (round-5 bisect follow-up: the
    topk stage is 50 of the 75 ms head-fwd micro and the k·2-pass
    extraction over the tile dominates it).

    Only tile values STRICTLY ABOVE ``kth`` (the min over the caller's
    top-k buffer(s)) can change any merged top-k value — the buffers
    already hold k entries ≥ kth, so a tile value ≤ kth can never
    displace one (ties swap equal values, leaving the value multiset
    identical). Once the stream warms up, a firing tile almost always
    holds only 1-3 such values: probe the ``probe_m`` largest first
    (probe_m·2 VPU passes over [b, tile] instead of k·2) and run the
    full extraction only when some row's probe_m-th largest still reads
    > kth (more than probe_m values might qualify there). Both branches
    produce bit-identical buffers (values-only merge).

    probe_m=2 is the measured optimum at the capacity operating point
    (tools/bench_probe_m.py, tile 2048 int8c b128: m=2 64.07 /
    m=4 68.65 / m=8 83.50 ms head fwd+bwd chain — the deep-fallback
    duty is low enough that the smallest probe wins)."""
    def fold(cand):
        for t_scr in topk_scrs:
            t_scr[:] = _topk_rows(
                jnp.concatenate([t_scr[:], cand], axis=-1), k)

    if k <= probe_m:
        fold(_topk_rows(zm, k))
        return
    probe = _topk_rows(zm, probe_m)                        # [b, m]
    deep = jnp.any(probe[:, probe_m - 1:] > kth)

    @pl.when(jnp.logical_not(deep))
    def _probe_merge():
        fold(probe)

    @pl.when(deep)
    def _full_merge():
        fold(_topk_rows(zm, k))


def _cos_int8_dot(e_int, se, w0_raw, s_lane):
    """[B, T] cosines on the int8 MXU path (2x bf16 throughput on v5e):
    exact int32 accumulation (|q| ≤ 127 ⇒ products Σ < 2^24 at D ≤ 1024),
    ONE f32 rounding in the post-dot scale — numerically tighter than the
    bf16 dot it replaces. ``se`` [B, 1] is the probes' per-row dequant
    scale (ops/qqueue.py quantize_rows)."""
    acc = jax.lax.dot_general(e_int, w0_raw, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.int32)
    if "deq" in _ABLATE:  # perf-bisect only: cost of the [B, T] dequant
        return acc.astype(jnp.float32)
    return acc.astype(jnp.float32) * (se * s_lane)


def _cos_tile(emb, w0_raw, s_lane, mxu_bf16, e8=None, zscale=None):
    """[B, T] cosine block against one stored tile. int8 tiles (``s_lane``
    [1, T] per-row scales riding the LANE axis) dequantize POST-dot:
    cos = (emb_bf16 @ int8→bf16ᵀ) · s — the int8→bf16 convert is exact
    (|q| ≤ 127) and the scale multiply is a [B, T] op instead of [T, D],
    so the per-byte VPU overhead that held the int8 classifier-read study
    to 1.37× (docs/PERF.md) shrinks by d/b. ``e8 = (e_int, se)`` (the
    int8-COMPUTE mode, pool.queue_int8_compute) runs the dot itself
    int8×int8→int32 on the MXU.

    ``zscale`` (the fixed-reference stream) returns zscale·cos directly
    with the factor folded into the CHEAP side — the [B, 1] probe scales
    (int8-compute), the [1, T] lane scales (int8 storage), or the [B, D]
    probe operand (float tiles; exact pre-dot for power-of-two scales) —
    so no separate [B, T] multiply ever runs."""
    if e8 is not None:
        se = e8[1] if zscale is None else e8[1] * zscale
        return _cos_int8_dot(e8[0], se, w0_raw, s_lane)
    if s_lane is None:
        e32 = emb if zscale is None else emb * zscale
        e_op, w_op = _mxu_pair(e32, w0_raw.astype(jnp.float32), mxu_bf16)
        return jnp.dot(e_op, w_op.T, preferred_element_type=jnp.float32)
    sl = s_lane if zscale is None else s_lane * zscale
    return jnp.dot(emb.astype(jnp.bfloat16), w0_raw.astype(jnp.bfloat16).T,
                   preferred_element_type=jnp.float32) * sl


def _demb_clean(dc, w0_raw, s_lane, mxu_bf16):
    """Clean-tile d_emb contribution dc @ w0: int8 tiles scale dc's lanes
    (dc_j·s_j·int_j) instead of dequantizing the [T, D] tile."""
    if s_lane is None:
        dc_op, w_op = _mxu_pair(dc, w0_raw.astype(jnp.float32), mxu_bf16)
        return jnp.dot(dc_op, w_op, preferred_element_type=jnp.float32)
    return jnp.dot((dc * s_lane).astype(jnp.bfloat16),
                   w0_raw.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)


def _dot_nt(a, b):
    """a [M, K] × b [N, K] → [M, N] (contraction on the lane axis of both
    — the MXU-native "NT" matmul, no relayout)."""
    return jax.lax.dot_general(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                               (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _lane_write_onehots(rows_c, cols_c, blend_c, t, tile):
    """Lane-oriented write-plan selectors for one tile: [Be, T] one-hots
    of the last parity-0 writer (M0) and the last blend writer (Mb) per
    tile column, plus their [1, T] override masks. Same last-write-wins
    semantics as ``effective_tile_views``' onehot_last, but built in
    entry×lane layout so the int8 written-tile path can override at the
    COS level (emb@gᵀ gathered through the one-hot) — the [T, D] dequant
    and every cross-layout transpose disappear."""
    be = rows_c.shape[0]
    col_e = t * tile + jax.lax.broadcasted_iota(jnp.int32, (be, tile), 1)
    mm = cols_c == col_e  # [Be, T]
    e_io = jax.lax.broadcasted_iota(jnp.int32, (be, tile), 0)

    def onehot_last(hit):
        last = jnp.max(jnp.where(hit, e_io, -1), axis=0, keepdims=True)
        oh = (hit & (e_io == last)).astype(jnp.float32)
        return oh, (last >= 0).astype(jnp.float32)

    m0, over0 = onehot_last(mm & (rows_c == 0))
    mb, overb = onehot_last(mm & (blend_c > 0))
    return m0, over0, mb, overb


def _int8_written_cos(emb, w0_raw, s_lane, g, v, oh, e8=None):
    """(cos1, cos2) for a written tile of an int8 queue: raw post-dot-scaled
    cosines with overridden columns replaced by emb·g / emb·v values gathered
    through the lane one-hots (``_lane_write_onehots``). The override dots
    always use the exact f32 ``emb`` — in int8-COMPUTE mode (``e8``) only
    the raw streamed columns carry probe-quantization error, mirroring how
    the bf16-MXU mode keeps gt/overrides f32."""
    m0, over0, mb, overb = oh
    if e8 is not None:
        cos_raw = _cos_int8_dot(e8[0], e8[1], w0_raw, s_lane)
    else:
        cos_raw = jnp.dot(emb.astype(jnp.bfloat16),
                          w0_raw.astype(jnp.bfloat16).T,
                          preferred_element_type=jnp.float32) * s_lane
    cos1 = jnp.where(over0 > 0,
                     jnp.dot(_dot_nt(emb, g), m0.astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32), cos_raw)
    cos2 = jnp.where(overb > 0,
                     jnp.dot(_dot_nt(emb, v), mb.astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32), cos1)
    return cos1, cos2


def _int8_written_demb(dc1, dc2, w0_raw, s_lane, g, v, oh):
    """d_emb contribution of a written int8 tile: dc routed per column to
    the int8 rows (scaled in the [B, T] lanes), the parity-0 override rows
    of g, or the blend rows of v — mirrors dc1 @ w0e + dc2 @ wbe."""
    m0, over0, mb, overb = oh
    not0 = 1.0 - over0
    notb = 1.0 - overb
    dc_int = (dc1 * not0 + dc2 * not0 * notb) * s_lane
    dc_g = dc1 * over0 + dc2 * over0 * notb
    dc_v = dc2 * overb
    d = jnp.dot(dc_int.astype(jnp.bfloat16), w0_raw.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
    d = d + jnp.dot(_dot_nt(dc_g, m0), g.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
    d = d + jnp.dot(_dot_nt(dc_v, mb), v.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
    return d


def _effective_views(w0, w1, col_ids, g, rows, cols, seen, mxu_bf16=False):
    """Apply this step's queue writes + parity blend to one tile, in
    registers. Plain jnp ops — shared verbatim by the scan implementation
    and the Pallas kernel bodies.

    w0/w1 [T, D] (fp32), col_ids [T] global slot ids, g [B, D] gallery
    embeddings (fp32), rows [B] parity, cols [B] slots, seen [B].
    Returns (w0_eff [T, D], wb_eff [T, D]): view-1 (row 0 after writes) and
    view-2 (parity blend after writes). Duplicate writes to one slot
    resolve to the HIGHEST batch index — the reference's last-write-wins
    sequential semantics (ffc.py:160-176).
    """
    b = g.shape[0]
    t = w0.shape[0]
    # Everything in [T, B] layout: reductions run over the LANE axis (fast on
    # the VPU) and the one-hot feeds the MXU untransposed — an in-kernel
    # [B, T] -> [T, B] transpose was a per-tile Mosaic relayout that made the
    # first version of this kernel compute-bound (3x slower than unfused).
    # Mosaic also only supports adding a minor dim to 32-bit vectors, so
    # reshape the int32 carriers first and compare after (never bool[:, None]).
    match = col_ids[:, None] == cols[None, :]  # [T, B]
    i_iota = jax.lax.broadcasted_iota(jnp.int32, (t, b), 1)

    def override(base, parity):
        hit = match & (rows[None, :] == parity)
        last = jnp.max(jnp.where(hit, i_iota, -1), axis=1, keepdims=True)  # [T, 1]
        onehot = (hit & (i_iota == last)).astype(jnp.float32)  # [T, B]
        # one-hot operands are exact in bf16; only g picks up bf16 rounding
        oh_op, g_op = _mxu_pair(onehot, g, mxu_bf16)
        ov = jnp.dot(oh_op, g_op, preferred_element_type=jnp.float32)  # [T, D]
        return jnp.where(last >= 0, ov, base)

    w0_eff = override(w0, 0)
    w1_eff = override(w1, 1)
    hit_mask = jnp.max(
        jnp.where(match & (seen[None, :] > 0), 1, 0), axis=1, keepdims=True
    )  # [T, 1] int32
    wb_eff = jnp.where(hit_mask > 0, w1_eff, w0_eff)
    return w0_eff, wb_eff


def _gather_plane(queue, plane, idx):
    """B-row gather from one queue plane WITHOUT materializing the plane:
    ``queue[plane]`` fed to a Pallas custom call forces XLA to copy the
    whole [Q, D] slice (4 GB at Q=4M bf16 — the q4M OOM); an advanced-index
    gather reads only the B rows."""
    b = idx.shape[0]
    return queue[jnp.full((b,), plane, jnp.int32), idx]


def _gather_plane_deq(queue, qscales, plane, idx):
    """B-row gather, dequantized to f32 when the queue is int8-stored
    (``qscales`` [2, Q] per-row scales, ops/qqueue.py) — still only B rows
    of the plane are read."""
    r = _gather_plane(queue, plane, idx).astype(jnp.float32)
    if qscales is not None:
        b = idx.shape[0]
        s = qscales[jnp.full((b,), plane, jnp.int32), idx]
        r = r * s.astype(jnp.float32)[:, None]
    return r


def compute_twin_gt(emb, queue, g, rows, cols, seen, labels, qscales=None):
    """(gt1, gt2): target cosines against both effective views — one B-row
    gather per queue row plus the in-register write/blend on those rows."""
    emb32 = emb.astype(jnp.float32)
    safe = jnp.maximum(labels, 0)
    r0 = _gather_plane_deq(queue, qscales, 0, safe)
    r1 = _gather_plane_deq(queue, qscales, 1, safe)
    r0_eff, rb_eff = _effective_views(r0, r1, safe.astype(jnp.int32),
                                      g.astype(jnp.float32),
                                      rows.astype(jnp.int32),
                                      cols.astype(jnp.int32), seen)
    gt1 = jnp.sum(emb32 * r0_eff, axis=-1)
    gt2 = jnp.sum(emb32 * rb_eff, axis=-1)
    return gt1, gt2


# ======================================================================
# scan reference implementation
# ======================================================================


def _twin_inputs(emb, queue, g, rows, cols, seen, tile, qscales=None):
    q0, q1 = queue[0], queue[1]
    b, d = emb.shape
    c = q0.shape[0]
    emb32 = emb.astype(jnp.float32)
    q0p, n_tiles = _pad_classes(q0, c, tile)
    q1p, _ = _pad_classes(q1, c, tile)
    if qscales is not None:
        # int8 queue (ops/qqueue.py): dequantize PER TILE inside the scan
        # bodies — a wholesale f32 copy of the planes is exactly the
        # materialization this path exists to avoid
        sp = qscales
        pad = (-c) % tile
        if pad:
            sp = jnp.concatenate(
                [sp, jnp.zeros((2, pad), sp.dtype)], axis=1)
        s_tiles = (sp[0].reshape(n_tiles, tile), sp[1].reshape(n_tiles, tile))
    else:
        s_tiles = None
    return (b, d, c, emb32, q0p.reshape(n_tiles, tile, d),
            q1p.reshape(n_tiles, tile, d), n_tiles,
            g.astype(jnp.float32), rows.astype(jnp.int32),
            cols.astype(jnp.int32), seen.astype(jnp.float32), s_tiles)


def _deq_tile(w_t, s_t):
    """f32 tile rows from a (possibly int8) stored tile + per-row scales."""
    w = w_t.astype(jnp.float32)
    return w if s_t is None else w * s_t[:, None].astype(jnp.float32)


def _twin_stream_fwd(emb, queue, g, rows, cols, seen, labels, gt1, gt2, *,
                     loss_type, margin, scale, k, mask_svfc, tile,
                     qscales=None):
    (b, d, c, emb32, w0s, w1s, n_tiles, g32, rows_i, cols_i, seen_f,
     s_tiles) = _twin_inputs(emb, queue, g, rows, cols, seen, tile, qscales)

    def one_view(carry, cos, col, valid, gt_col):
        m_run, s_run, topk = carry
        cos = jnp.where(valid, cos, NEG_INF)
        is_target = col == labels[:, None]
        mod = _tile_modified(cos, is_target, gt_col, valid, loss_type, margin, mask_svfc)
        z = scale * mod
        m_new = jnp.maximum(m_run, jnp.max(z, axis=-1))
        s_run = s_run * jnp.exp(m_run - m_new) + jnp.sum(jnp.exp(z - m_new[:, None]), axis=-1)
        # NON-target columns only (see the quad kernels' merge comment)
        topk, _ = jax.lax.top_k(
            jnp.concatenate([topk, jnp.where(is_target, NEG_INF, cos)],
                            axis=-1), k)
        return (m_new, s_run, topk)

    def body(carry, wt):
        c1, c2 = carry
        w0_t, w1_t, t, s0_t, s1_t = wt
        col = t * tile + jax.lax.broadcasted_iota(jnp.int32, (b, tile), 1)
        valid = col < c
        w0e, wbe = _effective_views(_deq_tile(w0_t, s0_t), _deq_tile(w1_t, s1_t),
                                    col[0], g32, rows_i, cols_i, seen_f)
        c1 = one_view(c1, emb32 @ w0e.T, col, valid, gt1[:, None])
        c2 = one_view(c2, emb32 @ wbe.T, col, valid, gt2[:, None])
        return (c1, c2), None

    init = lambda: (jnp.full((b,), NEG_INF, jnp.float32), jnp.zeros((b,), jnp.float32),  # noqa: E731
                    jnp.full((b, k), NEG_INF, jnp.float32))
    s0s, s1s = s_tiles if s_tiles is not None else (None, None)
    ((m1, s1, t1), (m2, s2, t2)), _ = jax.lax.scan(
        body, (init(), init()), (w0s, w1s, jnp.arange(n_tiles), s0s, s1s)
    )
    pos = labels >= 0

    def finish(m_run, s_run, topk, gt):
        logz = m_run + jnp.log(s_run)
        phi = _phi_target(gt, loss_type, margin, mask_svfc)
        ce = jnp.where(pos, logz - scale * phi, 0.0)
        neg = jnp.where(pos, 0.0, jnp.mean(jnp.maximum(topk, 0.0), axis=-1))
        return ce, neg, logz, topk

    ce1, neg1, logz1, topk1 = finish(m1, s1, t1, gt1)
    ce2, neg2, logz2, topk2 = finish(m2, s2, t2, gt2)
    return (ce1, neg1, ce2, neg2), (logz1, logz2, topk1, topk2)


def _view_dcos(cos, col, valid, labels, pos, gt, logz, kth, d_ce, d_neg, *,
               loss_type, margin, scale, k, mask_svfc):
    """One view's d_cos tile + its d_gt partial (shared scan/Pallas math)."""
    cos_v = jnp.where(valid, cos, NEG_INF)
    is_target = col == labels
    mod = _tile_modified(cos_v, is_target, gt, valid, loss_type, margin, mask_svfc)
    p = jnp.exp(scale * mod - logz)
    dz = (p - is_target.astype(jnp.float32)) * d_ce * scale
    if loss_type == "SV":
        hard = cos_v > (gt - margin)
        col_fac = jnp.where(hard & ~is_target, mask_svfc, 1.0)
    else:
        col_fac = 1.0
    d_cos = jnp.where(is_target, 0.0, dz * col_fac)
    d_gt_part = jnp.sum(jnp.where(is_target, dz, 0.0), axis=-1, keepdims=True)
    in_topk = (cos_v >= kth - KTH_TIE_TOL) & (cos_v > 0) & jnp.logical_not(pos)
    d_cos = d_cos + jnp.where(in_topk, d_neg / k, 0.0)
    return jnp.where(valid, d_cos, 0.0), d_gt_part


def _twin_stream_bwd(emb, queue, g, rows, cols, seen, labels, gt1, gt2,
                     logz1, logz2, topk1, topk2, d1, d2, *, loss_type, margin,
                     scale, k, mask_svfc, tile, qscales=None):
    """d_emb only — the queue is a stop-gradient constant in FFC."""
    (b, d, c, emb32, w0s, w1s, n_tiles, g32, rows_i, cols_i, seen_f,
     s_tiles) = _twin_inputs(emb, queue, g, rows, cols, seen, tile, qscales)
    pos2 = (labels >= 0)[:, None]
    d_ce1, d_neg1 = d1
    d_ce2, d_neg2 = d2
    d_ce1 = jnp.where(labels >= 0, d_ce1, 0.0)[:, None]
    d_ce2 = jnp.where(labels >= 0, d_ce2, 0.0)[:, None]
    d_neg1 = jnp.where(labels >= 0, 0.0, d_neg1)[:, None]
    d_neg2 = jnp.where(labels >= 0, 0.0, d_neg2)[:, None]
    kth1 = topk1[:, -1][:, None]
    kth2 = topk2[:, -1][:, None]
    kw = dict(loss_type=loss_type, margin=margin, scale=scale, k=k, mask_svfc=mask_svfc)
    lab2 = labels[:, None]

    def body(carry, wt):
        d_emb, dgt1, dgt2 = carry
        w0_t, w1_t, t, s0_t, s1_t = wt
        col = t * tile + jax.lax.broadcasted_iota(jnp.int32, (b, tile), 1)
        valid = col < c
        w0e, wbe = _effective_views(_deq_tile(w0_t, s0_t), _deq_tile(w1_t, s1_t),
                                    col[0], g32, rows_i, cols_i, seen_f)
        dc1, dg1 = _view_dcos(emb32 @ w0e.T, col, valid, lab2, pos2, gt1[:, None],
                              logz1[:, None], kth1, d_ce1, d_neg1, **kw)
        dc2, dg2 = _view_dcos(emb32 @ wbe.T, col, valid, lab2, pos2, gt2[:, None],
                              logz2[:, None], kth2, d_ce2, d_neg2, **kw)
        d_emb = d_emb + dc1 @ w0e + dc2 @ wbe
        return (d_emb, dgt1 + dg1[:, 0], dgt2 + dg2[:, 0]), None

    s0s, s1s = s_tiles if s_tiles is not None else (None, None)
    (d_emb, dgt1, dgt2), _ = jax.lax.scan(
        body,
        (jnp.zeros((b, d), jnp.float32), jnp.zeros((b,), jnp.float32),
         jnp.zeros((b,), jnp.float32)),
        (w0s, w1s, jnp.arange(n_tiles), s0s, s1s),
    )
    return _twin_gt_tail(emb, queue, g, rows, cols, seen, labels, gt1, gt2,
                         dgt1, dgt2, d_emb, loss_type, margin, qscales=qscales)


def _twin_gt_tail(emb, queue, g, rows, cols, seen, labels, gt1, gt2, dgt1,
                  dgt2, d_emb, loss_type, margin, qscales=None):
    """Route the φ'(gt) paths into d_emb via the effective label rows."""
    safe = jnp.maximum(labels, 0)
    r0 = _gather_plane_deq(queue, qscales, 0, safe)
    r1 = _gather_plane_deq(queue, qscales, 1, safe)
    r0_eff, rb_eff = _effective_views(r0, r1, safe.astype(jnp.int32),
                                      g.astype(jnp.float32),
                                      rows.astype(jnp.int32),
                                      cols.astype(jnp.int32),
                                      seen.astype(jnp.float32))
    pos1 = (labels >= 0).astype(jnp.float32)[:, None]
    d_emb = d_emb + (dgt1 * _phi_prime(gt1, loss_type, margin))[:, None] * r0_eff * pos1
    d_emb = d_emb + (dgt2 * _phi_prime(gt2, loss_type, margin))[:, None] * rb_eff * pos1
    return d_emb.astype(emb.dtype)


# ======================================================================
# Pallas kernels
# ======================================================================


def _pad_queue(queue, c, tile):
    """Pad the class axis of the FULL [2, Q, D] queue to a tile multiple.
    At the production queue sizes (powers of two ≥ tile) this is a no-op —
    the array passes through untouched (no copy)."""
    pad = (-c) % tile
    if pad:
        queue = jnp.concatenate(
            [queue, jnp.zeros((2, pad, queue.shape[2]), queue.dtype)], axis=1)
    return queue, (c + pad) // tile


def _scale_operand(qscales, c, tile):
    """(padded [2, Qp] scales operand, its BlockSpec) for an int8 queue —
    streamed alongside the plane-0 tiles (block (2, tile): the leading dim
    must equal the array dim for Mosaic; plane-1 scales ride along at
    8 B/row vs the tile's 512 B/row). None queue → (no operand, no spec)."""
    if qscales is None:
        return (), ()
    pad = (-c) % tile
    sp = qscales.astype(jnp.float32)
    if pad:
        sp = jnp.concatenate([sp, jnp.zeros((2, pad), jnp.float32)], axis=1)
    spec = pl.BlockSpec((2, tile), lambda t: (0, t), memory_space=pltpu.VMEM)
    return (sp,), (spec,)


def _twin_tile(b, d, tile, qbytes=4):
    """VMEM clamp: ONE double-buffered queue tile (q1 is never an operand
    — see twin_write_values), emb/g/v [B, D], and ~8 [B, tile] working
    buffers. ``qbytes`` is the queue storage itemsize — int8 tiles are 4x
    smaller than f32, which admits wider tiles (the [B, tile] f32 working
    set then dominates the budget)."""
    fixed = 24 * b * d
    per_col = 2 * qbytes * d + 40 * b
    max_tile = max(256, int((11 * 2**20 - fixed) // per_col) // 128 * 128)
    if qbytes == 1 and b <= 128:
        # Measured calibration (docs/PERF.md round-5 floor tool, capacity
        # shapes b128/d512): the estimator lands int8 on 1536→1280 after
        # _fit_tile, but tile 2048 COMPILES and runs the head fwd+bwd
        # 9.2 ms/iter faster (65.97 vs 75.20) — the ~8-buffer working-set
        # model overbooks the shipped stacked+probe path. 2560 also fits
        # but is slower (67.24); cap at the measured-best 2048. b>128
        # keeps the formula (working set scales with B; unmeasured).
        max_tile = max(max_tile, 2048)
    return min(tile, max_tile)




def _make_twin_fwd_kernel(b, d, c, tile, k, loss_type, margin, scale, mask_svfc,
                          mxu_bf16=False, partial_out=False):
    """``partial_out`` emits the raw per-shard online-softmax state
    (m, s, topk) per view instead of the finalized (ce, neg, logz, topk) —
    the model-sharded composition (parallel/sharded_twin.py) merges those
    across shards with pmax/psum/all_gather collectives before finalizing."""

    def kernel(labels_ref, gt1_ref, gt2_ref, rows_ref, cols_ref, blend_ref,
               emb_ref, g_ref, v_ref, w0_ref,
               ce1_ref, neg1_ref, ce2_ref, neg2_ref,
               logz1_ref, logz2_ref, topk1_ref, topk2_ref,
               m1_scr, s1_scr, t1_scr, m2_scr, s2_scr, t2_scr):
        t = pl.program_id(0)
        n_t = pl.num_programs(0)

        @pl.when(t == 0)
        def _init():
            for m_scr, s_scr, t_scr in ((m1_scr, s1_scr, t1_scr), (m2_scr, s2_scr, t2_scr)):
                m_scr[:] = jnp.full((b, 1), NEG_INF, jnp.float32)
                s_scr[:] = jnp.zeros((b, 1), jnp.float32)
                t_scr[:] = jnp.full((b, k), NEG_INF, jnp.float32)

        labels = labels_ref[:]
        emb = emb_ref[:].astype(jnp.float32)
        col = t * tile + jax.lax.broadcasted_iota(jnp.int32, (b, tile), 1)
        valid = col < c
        cols_v = cols_ref[:][:, 0]

        def view(cos, gt, m_scr, s_scr, topk_scr, ce_ref, neg_ref, logz_ref, topk_ref):
            cos = jnp.where(valid, cos, NEG_INF)
            is_target = col == labels
            mod = _tile_modified(cos, is_target, gt, valid, loss_type, margin, mask_svfc)
            z = scale * mod
            m_old = m_scr[:]
            m_new = jnp.maximum(m_old, jnp.max(z, axis=-1, keepdims=True))
            s_scr[:] = s_scr[:] * jnp.exp(m_old - m_new) + jnp.sum(
                jnp.exp(z - m_new), axis=-1, keepdims=True
            )
            m_scr[:] = m_new
            # NON-target columns only (see the quad kernels' merge comment)
            cos_neg = jnp.where(is_target, NEG_INF, cos)
            kth_cur = jnp.min(topk_scr[:], axis=-1, keepdims=True)
            needs_merge = jnp.any(jnp.max(cos_neg, axis=-1, keepdims=True) > kth_cur)

            @pl.when(needs_merge)
            def _merge():
                buf = jnp.concatenate([topk_scr[:], cos_neg], axis=-1)
                buf_col = jax.lax.broadcasted_iota(jnp.int32, (b, k + tile), 1)
                new_topk = []
                for _ in range(k):
                    vmax = jnp.max(buf, axis=-1, keepdims=True)
                    amax = jnp.argmax(buf, axis=-1)[:, None]
                    new_topk.append(vmax)
                    buf = jnp.where(buf_col == amax, NEG_INF, buf)
                topk_scr[:] = jnp.concatenate(new_topk, axis=-1)

            @pl.when(t == n_t - 1)
            def _finalize():
                if partial_out:
                    # per-shard partials: (ce1_ref, neg1_ref) carry (m, s)
                    ce_ref[:] = m_scr[:]
                    neg_ref[:] = s_scr[:]
                    topk_ref[:] = topk_scr[:]
                    return
                logz = m_scr[:] + jnp.log(s_scr[:])
                phi = _phi_target(gt, loss_type, margin, mask_svfc)
                pos = labels >= 0
                ce_ref[:] = jnp.where(pos, logz - scale * phi, 0.0)
                neg_ref[:] = jnp.where(
                    pos, 0.0, jnp.mean(jnp.maximum(topk_scr[:], 0.0), axis=-1, keepdims=True)
                )
                logz_ref[:] = logz
                topk_ref[:] = topk_scr[:]

        def both_views(cos1, cos2):
            view(cos1, gt1_ref[:], m1_scr, s1_scr, t1_scr, ce1_ref, neg1_ref,
                 logz1_ref, topk1_ref)
            view(cos2, gt2_ref[:], m2_scr, s2_scr, t2_scr, ce2_ref, neg2_ref,
                 logz2_ref, topk2_ref)

        # Per-tile write predication: only tiles holding one of this step's
        # B written slots need the override/blend machinery. For every other
        # tile (~all of them at Q ≫ B) both effective views ARE q0 —
        # cos2 == cos1, so 3 of the 4 MXU dots and the whole one-hot build
        # are skipped (the views still differ at the target column via
        # φ(gt1)/φ(gt2), which _tile_modified applies per view). q1 itself
        # is never an operand at all — view 2's values arrive precomputed
        # as the B-row ``v`` (twin_write_values).
        tile_hit = jnp.any((cols_v >= t * tile) & (cols_v < t * tile + tile))

        @pl.when(tile_hit)
        def _written_tile():
            w0e, wbe = effective_tile_views(
                w0_ref[0].astype(jnp.float32), col[0],
                g_ref[:].astype(jnp.float32), rows_ref[:][:, 0], cols_v,
                v_ref[:].astype(jnp.float32), blend_ref[:][:, 0],
                mxu_bf16=mxu_bf16,
            )
            e_op, w0_op = _mxu_pair(emb, w0e, mxu_bf16)
            _, wb_op = _mxu_pair(emb, wbe, mxu_bf16)
            cos1 = jnp.dot(e_op, w0_op.T, preferred_element_type=jnp.float32)
            cos2 = jnp.dot(e_op, wb_op.T, preferred_element_type=jnp.float32)
            both_views(cos1, cos2)

        @pl.when(jnp.logical_not(tile_hit))
        def _clean_tile():
            e_op, w0_op = _mxu_pair(emb, w0_ref[0].astype(jnp.float32), mxu_bf16)
            cos = jnp.dot(e_op, w0_op.T, preferred_element_type=jnp.float32)
            both_views(cos, cos)

    return kernel


def pallas_twin_fwd(emb, queue, g, rows, cols, seen, labels, gt1, gt2, *,
                    loss_type, margin, scale, k, mask_svfc, tile=512,
                    interpret=False):
    b, d = emb.shape
    c = queue.shape[1]
    tile = _fit_tile(c, _twin_tile(b, d, tile, qbytes=queue.dtype.itemsize))
    qp, n_tiles = _pad_queue(queue, c, tile)
    kernel = _make_twin_fwd_kernel(b, d, c, tile, k, loss_type, margin, scale, mask_svfc,
                                   mxu_bf16=queue.dtype == jnp.bfloat16)
    cols_i = cols.astype(jnp.int32)
    vw, blend_b = twin_write_values(_gather_plane(queue, 1, cols_i),
                                    g.astype(jnp.float32),
                                    rows.astype(jnp.int32), cols_i,
                                    seen.astype(jnp.float32))
    vec = lambda v, dt=jnp.float32: v[:, None].astype(dt)  # noqa: E731
    bspec = pl.BlockSpec((b, 1), lambda t: (0, 0), memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda t: (0, 0), memory_space=pltpu.VMEM)  # noqa: E731
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[bspec] * 6 + [
            full((b, d)),
            full((b, d)),
            full((b, d)),
            # plane-0 tiles of the FULL [2, Qp, D] queue: slicing queue[0]
            # outside the call would materialize the whole plane (see
            # _gather_plane)
            pl.BlockSpec((1, tile, d), lambda t: (0, t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[bspec] * 6 + [full((b, k)), full((b, k))],
        out_shape=[jax.ShapeDtypeStruct((b, 1), jnp.float32)] * 6
        + [jax.ShapeDtypeStruct((b, k), jnp.float32)] * 2,
        scratch_shapes=[
            pltpu.VMEM((b, 1), jnp.float32), pltpu.VMEM((b, 1), jnp.float32),
            pltpu.VMEM((b, k), jnp.float32),
            pltpu.VMEM((b, 1), jnp.float32), pltpu.VMEM((b, 1), jnp.float32),
            pltpu.VMEM((b, k), jnp.float32),
        ],
        interpret=interpret,
    )(labels.astype(jnp.int32)[:, None], vec(gt1), vec(gt2),
      rows.astype(jnp.int32)[:, None], cols.astype(jnp.int32)[:, None],
      blend_b.astype(jnp.int32)[:, None],
      emb.astype(jnp.float32), g.astype(jnp.float32), vw, qp)
    ce1, neg1, ce2, neg2, logz1, logz2, topk1, topk2 = out
    return ((ce1[:, 0], neg1[:, 0], ce2[:, 0], neg2[:, 0]),
            (logz1[:, 0], logz2[:, 0], topk1, topk2))


def _make_twin_bwd_kernel(b, d, c, tile, k, loss_type, margin, scale, mask_svfc,
                          mxu_bf16=False):
    kw = dict(loss_type=loss_type, margin=margin, scale=scale, k=k, mask_svfc=mask_svfc)

    def kernel(labels_ref, rows_ref, cols_ref, blend_ref,
               gt1_ref, gt2_ref, logz1_ref, logz2_ref, kth1_ref, kth2_ref,
               dce1_ref, dneg1_ref, dce2_ref, dneg2_ref,
               emb_ref, g_ref, v_ref, w0_ref,
               demb_ref, dgt1_ref, dgt2_ref,
               demb_scr, dgt1_scr, dgt2_scr):
        t = pl.program_id(0)
        n_t = pl.num_programs(0)

        @pl.when(t == 0)
        def _init():
            demb_scr[:] = jnp.zeros((b, d), jnp.float32)
            dgt1_scr[:] = jnp.zeros((b, 1), jnp.float32)
            dgt2_scr[:] = jnp.zeros((b, 1), jnp.float32)

        labels = labels_ref[:]
        pos = labels >= 0
        emb = emb_ref[:].astype(jnp.float32)
        col = t * tile + jax.lax.broadcasted_iota(jnp.int32, (b, tile), 1)
        valid = col < c
        cols_v = cols_ref[:][:, 0]

        def view_dcs(cos1, cos2):
            dc1, dg1 = _view_dcos(cos1, col, valid, labels, pos, gt1_ref[:],
                                  logz1_ref[:], kth1_ref[:], dce1_ref[:], dneg1_ref[:], **kw)
            dc2, dg2 = _view_dcos(cos2, col, valid, labels, pos, gt2_ref[:],
                                  logz2_ref[:], kth2_ref[:], dce2_ref[:], dneg2_ref[:], **kw)
            dgt1_scr[:] = dgt1_scr[:] + dg1
            dgt2_scr[:] = dgt2_scr[:] + dg2
            return dc1, dc2

        # same per-tile write predication as the forward kernel: clean tiles
        # (no written slot in range) have identical views, so one cosine dot
        # and ONE combined d_emb dot replace the 6-dot full path; q1 is not
        # an operand at all (view-2 values arrive as the B-row ``v``)
        tile_hit = jnp.any((cols_v >= t * tile) & (cols_v < t * tile + tile))

        @pl.when(tile_hit)
        def _written_tile():
            w0e, wbe = effective_tile_views(
                w0_ref[0].astype(jnp.float32), col[0],
                g_ref[:].astype(jnp.float32), rows_ref[:][:, 0], cols_v,
                v_ref[:].astype(jnp.float32), blend_ref[:][:, 0],
                mxu_bf16=mxu_bf16,
            )
            e_op, w0_op = _mxu_pair(emb, w0e, mxu_bf16)
            _, wb_op = _mxu_pair(emb, wbe, mxu_bf16)
            cos1 = jnp.dot(e_op, w0_op.T, preferred_element_type=jnp.float32)
            cos2 = jnp.dot(e_op, wb_op.T, preferred_element_type=jnp.float32)
            dc1, dc2 = view_dcs(cos1, cos2)
            dc1_op, _ = _mxu_pair(dc1, dc1, mxu_bf16)
            dc2_op, _ = _mxu_pair(dc2, dc2, mxu_bf16)
            demb_scr[:] = demb_scr[:] + jnp.dot(dc1_op, w0_op, preferred_element_type=jnp.float32) \
                + jnp.dot(dc2_op, wb_op, preferred_element_type=jnp.float32)

        @pl.when(jnp.logical_not(tile_hit))
        def _clean_tile():
            e_op, w0_op = _mxu_pair(emb, w0_ref[0].astype(jnp.float32), mxu_bf16)
            cos = jnp.dot(e_op, w0_op.T, preferred_element_type=jnp.float32)
            dc1, dc2 = view_dcs(cos, cos)
            dc_op, _ = _mxu_pair(dc1 + dc2, dc1, mxu_bf16)
            demb_scr[:] = demb_scr[:] + jnp.dot(dc_op, w0_op, preferred_element_type=jnp.float32)

        @pl.when(t == n_t - 1)
        def _finalize():
            demb_ref[:] = demb_scr[:]
            dgt1_ref[:] = dgt1_scr[:]
            dgt2_ref[:] = dgt2_scr[:]

    return kernel


def pallas_twin_bwd(emb, queue, g, rows, cols, seen, labels, gt1, gt2,
                    logz1, logz2, topk1, topk2, d1, d2, *, loss_type, margin,
                    scale, k, mask_svfc, tile=512, interpret=False):
    b, d = emb.shape
    c = queue.shape[1]
    tile = _fit_tile(c, _twin_tile(b, d, tile, qbytes=queue.dtype.itemsize))
    qp, n_tiles = _pad_queue(queue, c, tile)
    kernel = _make_twin_bwd_kernel(b, d, c, tile, k, loss_type, margin, scale, mask_svfc,
                                   mxu_bf16=queue.dtype == jnp.bfloat16)
    cols_i = cols.astype(jnp.int32)
    vw, blend_b = twin_write_values(_gather_plane(queue, 1, cols_i),
                                    g.astype(jnp.float32),
                                    rows.astype(jnp.int32), cols_i,
                                    seen.astype(jnp.float32))
    d_ce1, d_neg1 = d1
    d_ce2, d_neg2 = d2
    pos = labels >= 0
    d_ce1 = jnp.where(pos, d_ce1, 0.0)
    d_ce2 = jnp.where(pos, d_ce2, 0.0)
    d_neg1 = jnp.where(pos, 0.0, d_neg1)
    d_neg2 = jnp.where(pos, 0.0, d_neg2)
    vec = lambda v: v[:, None].astype(jnp.float32)  # noqa: E731
    bspec = pl.BlockSpec((b, 1), lambda t: (0, 0), memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda t: (0, 0), memory_space=pltpu.VMEM)  # noqa: E731
    d_emb, dgt1, dgt2 = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[bspec] * 14 + [
            full((b, d)),
            full((b, d)),
            full((b, d)),
            pl.BlockSpec((1, tile, d), lambda t: (0, t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[full((b, d)), bspec, bspec],
        out_shape=[
            jax.ShapeDtypeStruct((b, d), jnp.float32),
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, d), jnp.float32),
            pltpu.VMEM((b, 1), jnp.float32),
            pltpu.VMEM((b, 1), jnp.float32),
        ],
        interpret=interpret,
    )(labels.astype(jnp.int32)[:, None], rows.astype(jnp.int32)[:, None],
      cols.astype(jnp.int32)[:, None], blend_b.astype(jnp.int32)[:, None],
      vec(gt1), vec(gt2), vec(logz1), vec(logz2),
      vec(topk1[:, -1]), vec(topk2[:, -1]),
      vec(d_ce1), vec(d_neg1), vec(d_ce2), vec(d_neg2),
      emb.astype(jnp.float32), g.astype(jnp.float32), vw, qp)
    return _twin_gt_tail(emb, queue, g, rows, cols, seen, labels, gt1, gt2,
                         dgt1[:, 0], dgt2[:, 0], d_emb, loss_type, margin)


# ======================================================================
# per-shard partial kernels (the model-sharded composition's hot path)
# ======================================================================
#
# parallel/sharded_twin.py splits the queue row-wise over the mesh "model"
# axis. Each shard streams ITS rows with these kernels and the composition
# merges the per-shard online-softmax states with pmax/psum/all_gather.
# Inputs arrive pre-localized by the composition:
#   * q_local  [2, C/m, D] — this shard's queue rows (full local block; the
#     plane-0 tiles stream via the leading BlockSpec dim, plane 1 is only
#     touched by the B-row gather the caller did for ``v``);
#   * lcols    [B] — write columns in LOCAL coordinates, -1 when the write
#     lands on another shard (never matches a local column);
#   * labels_l [B] — labels in LOCAL coordinates; -1 global outliers, -2
#     positives owned by another shard (both never match a local column;
#     the -1/-2 split keeps the kernels' pos test correct for outliers);
#   * gt1/gt2, logz, kth — GLOBAL values (already psum/pmax-merged).


def pallas_twin_partial_fwd(emb, q_local, v, blend_b, g, rows, lcols, labels_l,
                            gt1, gt2, *, loss_type, margin, scale, k, mask_svfc,
                            tile=512, interpret=False, mxu_bf16=False):
    """One shard's twin forward partials: ((m1, s1, topk1), (m2, s2, topk2)).

    ``v``/``blend_b`` come from twin_write_values on the shard's local q1
    gather (see parallel/sharded_twin.py:_write_values).

    Under a data axis the write plan (g/rows/lcols/v/blend_b) has the
    GLOBAL batch length while emb/labels carry the local data shard — the
    kernel body matches tile columns against the full plan, so the two
    batch sizes are independent here."""
    b, d = emb.shape
    bp = rows.shape[0]  # write-plan length (global batch)
    c = q_local.shape[1]
    tile = _fit_tile(c, _twin_tile(max(b, bp), d, tile,
                                   qbytes=q_local.dtype.itemsize))
    qp, n_tiles = _pad_queue(q_local, c, tile)
    kernel = _make_twin_fwd_kernel(b, d, c, tile, k, loss_type, margin, scale,
                                   mask_svfc, mxu_bf16=mxu_bf16, partial_out=True)

    def adapter(labels_ref, gt1_ref, gt2_ref, rows_ref, cols_ref, blend_ref,
                emb_ref, g_ref, v_ref, w0_ref,
                m1_ref, s1_ref, m2_ref, s2_ref, topk1_ref, topk2_ref, *scratch):
        kernel(labels_ref, gt1_ref, gt2_ref, rows_ref, cols_ref, blend_ref,
               emb_ref, g_ref, v_ref, w0_ref,
               m1_ref, s1_ref, m2_ref, s2_ref, None, None, topk1_ref, topk2_ref,
               *scratch)

    vec = lambda x, dt=jnp.float32: x[:, None].astype(dt)  # noqa: E731
    bspec = pl.BlockSpec((b, 1), lambda t: (0, 0), memory_space=pltpu.VMEM)
    pspec = pl.BlockSpec((bp, 1), lambda t: (0, 0), memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda t: (0, 0), memory_space=pltpu.VMEM)  # noqa: E731
    out = pl.pallas_call(
        adapter,
        grid=(n_tiles,),
        in_specs=[bspec] * 3 + [pspec] * 3 + [
            full((b, d)), full((bp, d)), full((bp, d)),
            pl.BlockSpec((1, tile, d), lambda t: (0, t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[bspec] * 4 + [full((b, k))] * 2,
        out_shape=[jax.ShapeDtypeStruct((b, 1), jnp.float32)] * 4
        + [jax.ShapeDtypeStruct((b, k), jnp.float32)] * 2,
        scratch_shapes=[
            pltpu.VMEM((b, 1), jnp.float32), pltpu.VMEM((b, 1), jnp.float32),
            pltpu.VMEM((b, k), jnp.float32),
            pltpu.VMEM((b, 1), jnp.float32), pltpu.VMEM((b, 1), jnp.float32),
            pltpu.VMEM((b, k), jnp.float32),
        ],
        interpret=interpret,
    )(labels_l.astype(jnp.int32)[:, None], vec(gt1), vec(gt2),
      rows.astype(jnp.int32)[:, None], lcols.astype(jnp.int32)[:, None],
      blend_b.astype(jnp.int32)[:, None],
      emb.astype(jnp.float32), g.astype(jnp.float32), v, qp)
    m1, s1, m2, s2, topk1, topk2 = out
    return ((m1[:, 0], s1[:, 0], topk1), (m2[:, 0], s2[:, 0], topk2))


def pallas_twin_partial_bwd(emb, q_local, v, blend_b, g, rows, lcols, labels_l,
                            gt1, gt2, logz1, logz2, kth1, kth2, d1, d2, *,
                            loss_type, margin, scale, k, mask_svfc, tile=512,
                            interpret=False, mxu_bf16=False):
    """One shard's twin backward: (d_emb_partial, dgt1_raw, dgt2_raw).

    Streams only the local plane-0 tiles against the GLOBAL (gt, logz, kth).
    The φ'(gt) tail and the owner-shard gt-row routing stay in the
    composition (they need the psum over shards of the raw dgt). The caller
    must pre-mask the cotangents with the GLOBAL pos/outlier split — the
    kernel's own pos test sees localized labels."""
    b, d = emb.shape
    bp = rows.shape[0]  # write-plan length (global batch)
    c = q_local.shape[1]
    tile = _fit_tile(c, _twin_tile(max(b, bp), d, tile,
                                   qbytes=q_local.dtype.itemsize))
    qp, n_tiles = _pad_queue(q_local, c, tile)
    kernel = _make_twin_bwd_kernel(b, d, c, tile, k, loss_type, margin, scale,
                                   mask_svfc, mxu_bf16=mxu_bf16)
    d_ce1, d_neg1 = d1
    d_ce2, d_neg2 = d2
    vec = lambda x: x[:, None].astype(jnp.float32)  # noqa: E731
    bspec = pl.BlockSpec((b, 1), lambda t: (0, 0), memory_space=pltpu.VMEM)
    pspec = pl.BlockSpec((bp, 1), lambda t: (0, 0), memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda t: (0, 0), memory_space=pltpu.VMEM)  # noqa: E731
    d_emb, dgt1, dgt2 = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[bspec] + [pspec] * 3 + [bspec] * 10 + [
            full((b, d)), full((bp, d)), full((bp, d)),
            pl.BlockSpec((1, tile, d), lambda t: (0, t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[full((b, d)), bspec, bspec],
        out_shape=[
            jax.ShapeDtypeStruct((b, d), jnp.float32),
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, d), jnp.float32),
            pltpu.VMEM((b, 1), jnp.float32),
            pltpu.VMEM((b, 1), jnp.float32),
        ],
        interpret=interpret,
    )(labels_l.astype(jnp.int32)[:, None], rows.astype(jnp.int32)[:, None],
      lcols.astype(jnp.int32)[:, None], blend_b.astype(jnp.int32)[:, None],
      vec(gt1), vec(gt2), vec(logz1), vec(logz2), vec(kth1), vec(kth2),
      vec(d_ce1), vec(d_neg1), vec(d_ce2), vec(d_neg2),
      emb.astype(jnp.float32), g.astype(jnp.float32), v, qp)
    return d_emb, dgt1[:, 0], dgt2[:, 0]


# ======================================================================
# public custom-VJP op
# ======================================================================


@partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12, 13))
def fused_twin_margin(emb, queue, g, rows, cols, seen, labels, loss_type="Arc",
                      margin=0.5, scale=32.0, hard_neg=10, mask_svfc=1.2,
                      tile=512, use_pallas="auto"):
    """Per-row (ce1, neg1, ce2, neg2) over the two FFC queue views in one
    streaming pass, with the step's writes applied in-register.
    Differentiable w.r.t. ``emb`` only (queue and gallery embeddings are
    stop-gradient constants in FFC)."""
    out, _ = _twin_fwd_impl(emb, queue, g, rows, cols, seen, labels, loss_type,
                            margin, scale, hard_neg, mask_svfc, tile, use_pallas)
    return out


def _twin_fwd_impl(emb, queue, g, rows, cols, seen, labels, loss_type, margin,
                   scale, hard_neg, mask_svfc, tile, use_pallas, gts=None):
    if gts is None:
        gts = compute_twin_gt(emb, queue, g, rows, cols, seen, labels)
    gt1, gt2 = gts
    if use_pallas == "auto":
        use_pallas = jax.default_backend() == "tpu"
    kw = dict(loss_type=loss_type, margin=margin, scale=scale, k=hard_neg,
              mask_svfc=mask_svfc, tile=tile)
    fn = pallas_twin_fwd if use_pallas else _twin_stream_fwd
    out, res = fn(emb, queue, g, rows, cols, seen, labels, gt1, gt2, **kw)
    # streaming top-1 train accuracy, free from state the forward already
    # has: the view-1 stream's running top-k is over RAW cosines (target
    # column included, its raw cosine == gt1), so the target is the
    # (tied-)max exactly when gt1 >= topk1[0] (reference reports no FFC
    # train accuracy at all; round-2 verdict item 6)
    topk1 = res[2]
    hit1 = ((gt1 + KTH_TIE_TOL >= topk1[:, 0]) & (labels >= 0)).astype(jnp.float32)
    return out + (hit1,), res


def _twin_vjp_fwd(emb, queue, g, rows, cols, seen, labels, loss_type, margin,
                  scale, hard_neg, mask_svfc, tile, use_pallas):
    gts = compute_twin_gt(emb, queue, g, rows, cols, seen, labels)
    out, res = _twin_fwd_impl(emb, queue, g, rows, cols, seen, labels, loss_type,
                              margin, scale, hard_neg, mask_svfc, tile, use_pallas,
                              gts=gts)
    logz1, logz2, topk1, topk2 = res
    return out, (emb, queue, g, rows, cols, seen, labels,
                 gts[0], gts[1], logz1, logz2, topk1, topk2)


def _twin_vjp_bwd(loss_type, margin, scale, hard_neg, mask_svfc, tile, use_pallas,
                  res, cots):
    (emb, queue, g, rows, cols, seen, labels,
     gt1, gt2, logz1, logz2, topk1, topk2) = res
    # the 5th output (hit indicator) is piecewise-constant: zero gradient
    d_ce1, d_neg1, d_ce2, d_neg2, _d_hit = cots
    if use_pallas == "auto":
        use_pallas = jax.default_backend() == "tpu"
    kw = dict(loss_type=loss_type, margin=margin, scale=scale, k=hard_neg,
              mask_svfc=mask_svfc, tile=tile)
    fn = pallas_twin_bwd if use_pallas else _twin_stream_bwd
    d_emb = fn(emb, queue, g, rows, cols, seen, labels, gt1, gt2,
               logz1, logz2, topk1, topk2, (d_ce1, d_neg1), (d_ce2, d_neg2), **kw)
    # queue/gallery are non-trained constants: broadcast-zero cotangents are
    # dropped by JAX's partial eval (never materialized)
    return (d_emb, jnp.zeros_like(queue), jnp.zeros_like(g),
            None, None, None, None)


fused_twin_margin.defvjp(_twin_vjp_fwd, _twin_vjp_bwd)


def reduce_margin_dir(ce1, neg1, ce2, neg2, labels):
    """The exact per-direction scalar reduction of the FFC twin loss
    (reference ffc.py:140-151 class/outlier split): mean CE over in-pool
    rows + mean hard-neg hinge over outlier rows, summed over the two
    views. Single source of truth — the sharded compositions
    (parallel/sharded_twin.py, sharded_quad.py) pin sharded-vs-single
    parity against this reduction, so it must not fork."""
    pos = (labels >= 0).astype(jnp.float32)
    n_pos = jnp.maximum(jnp.sum(pos), 1.0)
    n_out = jnp.maximum(jnp.sum(1.0 - pos), 1.0)
    any_pos = jnp.sum(pos) > 0
    any_out = jnp.sum(1.0 - pos) > 0

    def reduce(ce, neg):
        cls = jnp.where(any_pos, jnp.sum(ce) / n_pos, 0.0)
        ngl = jnp.where(any_out, jnp.sum(neg) / n_out, 0.0)
        return cls + ngl

    return reduce(ce1, neg1) + reduce(ce2, neg2)


def twin_add_margin(emb, queue, g, rows, cols, seen, labels, *, loss_type="Arc",
                    margin=0.5, scale=32.0, hard_neg=10, mask_svfc=1.2,
                    tile=512, use_pallas="auto", with_acc=False):
    """Scalar loss = add_margin(view1) + add_margin(view2) — the exact
    reduction of the FFC directional loss (core/ffc.py directional_loss),
    both views streamed in one fused pass with in-register queue writes.
    ``queue`` is the FULL [2, Q, D] array — never slice the planes at the
    call site (see _gather_plane). ``with_acc`` also returns the streaming
    top-1 accuracy over in-pool rows (view 1)."""
    if queue.dtype == jnp.int8:
        raise ValueError(
            "int8 queues run through the quad route only (quad_add_margin "
            "/ parallel.sharded_quad) — core/ffc.py routes every fused "
            "config there; the legacy twin composition has no scales "
            "plumbing.")
    ce1, neg1, ce2, neg2, hit1 = fused_twin_margin(
        emb, queue, g, rows, cols, seen, labels, loss_type, margin, scale,
        hard_neg, mask_svfc, tile, use_pallas,
    )
    loss = reduce_margin_dir(ce1, neg1, ce2, neg2, labels)
    if with_acc:
        n_pos = jnp.maximum(jnp.sum((labels >= 0).astype(jnp.float32)), 1.0)
        return loss, jnp.sum(hit1) / n_pos
    return loss


# ======================================================================
# quad kernels: BOTH FFC directions in one pass over q0
# ======================================================================
#
# The FFC step computes two directional losses against the SAME pre-update
# queue (core/ffc.py: rollback-free double pass). As two twin calls that is
# 4 streaming passes over q0 per step (A fwd, B fwd, A bwd, B bwd) — and
# the streams are HBM-bound, so the queue bytes ARE the cost. The quad
# kernels advance all four view streams (2 directions × 2 views) per q0
# tile: 2 passes per step over the queue instead of 4.


def _quad_dir_fwd(b, c, tile, k, loss_type, margin, scale, mask_svfc, mxu_bf16,
                  t, n_t, col, valid, w0_raw, s_lane,
                  lab_ref, gt1_ref, gt2_ref, rows_ref, cols_ref, blend_ref,
                  emb_ref, g_ref, v_ref,
                  scr1, scr2, out1, out2, partial_out=False, e8=None):
    """One direction's per-tile forward work (the twin fwd body).

    ``partial_out`` (the model-sharded composition): finalize emits the raw
    per-shard (m, s, topk) per view — target column INCLUDED via φ(gt) on
    the owner shard — instead of the finished (ce, neg, logz, topk)."""
    labels = lab_ref[:]
    emb = emb_ref[:].astype(jnp.float32)
    cols_v = cols_ref[:][:, 0]

    def view(cos, gt, scr, out):
        m_scr, s_scr, topk_scr = scr
        ce_ref, neg_ref, logz_ref, topk_ref = out
        cos = jnp.where(valid, cos, NEG_INF)
        is_target = col == labels
        mod = _tile_modified(cos, is_target, gt, valid, loss_type, margin, mask_svfc)
        z = scale * mod
        m_old = m_scr[:]
        m_new = jnp.maximum(m_old, jnp.max(z, axis=-1, keepdims=True))
        s_scr[:] = s_scr[:] * jnp.exp(m_old - m_new) + jnp.sum(
            jnp.exp(z - m_new), axis=-1, keepdims=True)
        m_scr[:] = m_new
        # top-k over NON-target columns: the hit test gt + TOL >= topk[0]
        # must never compare gt against the kernel's own recomputation of
        # the target column (TPU f32 dots round differently from the
        # outside-computed gt — was silently killing ~half the streamed
        # train_acc hits; loss unaffected, see docs/PERF.md round 3)
        cos_neg = jnp.where(is_target, NEG_INF, cos)
        kth_cur = jnp.min(topk_scr[:], axis=-1, keepdims=True)
        needs_merge = jnp.any(jnp.max(cos_neg, axis=-1, keepdims=True) > kth_cur)

        @pl.when(needs_merge)
        def _merge():
            buf = jnp.concatenate([topk_scr[:], cos_neg], axis=-1)
            buf_col = jax.lax.broadcasted_iota(jnp.int32, (b, k + tile), 1)
            new_topk = []
            for _ in range(k):
                vmax = jnp.max(buf, axis=-1, keepdims=True)
                amax = jnp.argmax(buf, axis=-1)[:, None]
                new_topk.append(vmax)
                buf = jnp.where(buf_col == amax, NEG_INF, buf)
            topk_scr[:] = jnp.concatenate(new_topk, axis=-1)

        @pl.when(t == n_t - 1)
        def _finalize():
            if partial_out:
                ce_ref[:] = m_scr[:]
                neg_ref[:] = s_scr[:]
                topk_ref[:] = topk_scr[:]
                return
            logz = m_scr[:] + jnp.log(s_scr[:])
            phi = _phi_target(gt, loss_type, margin, mask_svfc)
            pos = labels >= 0
            ce_ref[:] = jnp.where(pos, logz - scale * phi, 0.0)
            neg_ref[:] = jnp.where(
                pos, 0.0,
                jnp.mean(jnp.maximum(topk_scr[:], 0.0), axis=-1, keepdims=True))
            logz_ref[:] = logz
            topk_ref[:] = topk_scr[:]

    tile_hit = jnp.any((cols_v >= t * tile) & (cols_v < t * tile + tile))

    @pl.when(tile_hit)
    def _written_tile():
        if s_lane is not None:
            cos1, cos2 = _int8_written_cos(
                emb, w0_raw, s_lane, g_ref[:], v_ref[:],
                _lane_write_onehots(rows_ref[:], cols_ref[:], blend_ref[:],
                                    t, tile), e8=e8)
        else:
            w0e, wbe = effective_tile_views(
                w0_raw.astype(jnp.float32), col[0],
                g_ref[:].astype(jnp.float32), rows_ref[:][:, 0], cols_v,
                v_ref[:].astype(jnp.float32), blend_ref[:][:, 0],
                mxu_bf16=mxu_bf16)
            e_op, w0_op = _mxu_pair(emb, w0e, mxu_bf16)
            _, wb_op = _mxu_pair(emb, wbe, mxu_bf16)
            cos1 = jnp.dot(e_op, w0_op.T, preferred_element_type=jnp.float32)
            cos2 = jnp.dot(e_op, wb_op.T, preferred_element_type=jnp.float32)
        view(cos1, gt1_ref[:], scr1, out1)
        view(cos2, gt2_ref[:], scr2, out2)

    @pl.when(jnp.logical_not(tile_hit))
    def _clean_tile():
        cos = _cos_tile(emb, w0_raw, s_lane, mxu_bf16, e8=e8)
        view(cos, gt1_ref[:], scr1, out1)
        view(cos, gt2_ref[:], scr2, out2)


def _quad_stacked_clean_fwd(b, c, tile, k, scale, t, w0_raw, s_lane,
                            mxu_bf16, lab_a, lab_b, emb_a, emb_b,
                            e8_a, e8_b, scrs_a, scrs_b):
    """BOTH-directions-clean per-tile forward on ONE stacked [2B, tile]
    cosine dot (see _STACKED). Semantics per direction are exactly the
    zfix stream: fixed-reference exp fold into both views' s, shared
    top-k candidate extraction. The needs-check is OR'd across the two
    directions — a merge firing for a direction whose candidates don't
    beat its kth leaves that buffer's values unchanged, so results stay
    bit-identical. Callers route written tiles and the finalize tile to
    the per-direction bodies."""
    labels2 = jnp.concatenate([lab_a, lab_b], axis=0)            # [2b, 1]
    col2 = t * tile + jax.lax.broadcasted_iota(jnp.int32, (2 * b, tile), 1)
    neg_ok2 = (col2 < c) & jnp.logical_not(col2 == labels2)
    if e8_a is not None:
        e8_2 = (jnp.concatenate([e8_a[0], e8_b[0]], axis=0),
                jnp.concatenate([e8_a[1], e8_b[1]], axis=0))
        emb2 = emb_a  # unused on the int8-compute path
    else:
        e8_2 = None
        emb2 = jnp.concatenate([emb_a, emb_b], axis=0).astype(jnp.float32)
    z = _cos_tile(emb2, w0_raw, s_lane, mxu_bf16, e8=e8_2, zscale=scale)
    zm = z if "mask" in _ABLATE else jnp.where(neg_ok2, z, NEG_INF)
    e = (zm - scale) if "exp" in _ABLATE else jnp.exp(zm - scale)
    ts = jnp.sum(e, axis=-1, keepdims=True)                      # [2b, 1]
    ts_a, ts_b = ts[:b], ts[b:]
    for scr in scrs_a:
        scr[1][:] = scr[1][:] + ts_a
    for scr in scrs_b:
        scr[1][:] = scr[1][:] + ts_b
    if "topk" in _ABLATE:
        return
    kth_a = jnp.minimum(jnp.min(scrs_a[0][2][:], axis=-1, keepdims=True),
                        jnp.min(scrs_a[1][2][:], axis=-1, keepdims=True))
    kth_b = jnp.minimum(jnp.min(scrs_b[0][2][:], axis=-1, keepdims=True),
                        jnp.min(scrs_b[1][2][:], axis=-1, keepdims=True))
    # Per-DIRECTION merge gating (round-5 bisect follow-up): the topk
    # stage is ~50 of the 75 ms head-fwd micro and the merge (k max+
    # argmax passes over the whole tile) dominates it, so firing it for
    # BOTH directions whenever EITHER improves — the first stacked cut's
    # OR'd `needs` — pays the expensive extraction twice as often as the
    # per-direction bodies do. Gate each direction on its own rows; the
    # merge math per direction is unchanged, so results stay
    # bit-identical (a direction that fires without beating its kth
    # leaves its buffers unchanged, as before).
    zx = jnp.max(zm, axis=-1, keepdims=True)                     # [2b, 1]

    @pl.when(jnp.any(zx[:b] > kth_a))
    def _merge_a():
        _merge_tile_topk(zm[:b], kth_a, [scr[2] for scr in scrs_a], k)

    @pl.when(jnp.any(zx[b:] > kth_b))
    def _merge_b():
        _merge_tile_topk(zm[b:], kth_b, [scr[2] for scr in scrs_b], k)


def _quad_stacked_clean_bwd(b, c, tile, k, scale, t, w0_raw, s_lane,
                            mxu_bf16, lab_a, lab_b, emb_a, emb_b,
                            e8_a, e8_b, ins_a, ins_b, demb_a, demb_b):
    """BOTH-directions-clean per-tile backward on ONE stacked [2B, tile]
    z-recompute dot + ONE stacked d_emb dot (see _STACKED /
    _quad_stacked_clean_fwd). ``ins_*`` carry each direction's per-row
    view state as VALUES: (logz1, logz2, dce1, dce2, dneg1, dneg2,
    kth1, kth2), all [B, 1]. Row-wise math — bit-identical to
    _quad_dir_bwd_shared's clean tile; written/final tiles route to the
    per-direction path (the dgt finalize lives there)."""
    labels2 = jnp.concatenate([lab_a, lab_b], axis=0)            # [2b, 1]
    col2 = t * tile + jax.lax.broadcasted_iota(jnp.int32, (2 * b, tile), 1)
    neg_ok2 = (col2 < c) & jnp.logical_not(col2 == labels2)
    st = lambda i: jnp.concatenate([ins_a[i], ins_b[i]], axis=0)  # noqa: E731
    logz1, logz2, dce1, dce2, dneg1, dneg2, kth1, kth2 = map(
        st, range(8))
    ref = jnp.minimum(logz1, logz2)
    c12 = (dce1 * jnp.exp(ref - logz1) + dce2 * jnp.exp(ref - logz2)) * scale
    zthr1 = jnp.maximum(scale * (kth1 - KTH_TIE_TOL), _Z_POS_TINY)
    zthr2 = jnp.maximum(scale * (kth2 - KTH_TIE_TOL), _Z_POS_TINY)
    dn1 = dneg1 * (1.0 / k)
    dn2 = dneg2 * (1.0 / k)
    if e8_a is not None:
        e8_2 = (jnp.concatenate([e8_a[0], e8_b[0]], axis=0),
                jnp.concatenate([e8_a[1], e8_b[1]], axis=0))
        emb2 = emb_a  # unused on the int8-compute path
    else:
        e8_2 = None
        emb2 = jnp.concatenate([emb_a, emb_b], axis=0).astype(jnp.float32)
    z = _cos_tile(emb2, w0_raw, s_lane, mxu_bf16, e8=e8_2, zscale=scale)
    zm = jnp.where(neg_ok2, z, NEG_INF)
    dc = jnp.exp(zm - ref) * c12
    dc = dc + jnp.where(zm >= zthr1, dn1, 0.0)
    dc = dc + jnp.where(zm >= zthr2, dn2, 0.0)
    out = _demb_clean(dc, w0_raw, s_lane, mxu_bf16)              # [2b, d]
    demb_a[:] = demb_a[:] + out[:b]
    demb_b[:] = demb_b[:] + out[b:]


def _make_quad_fwd_kernel(b, d, c, tile, k, loss_type, margin, scale, mask_svfc,
                          mxu_bf16=False, partial_out=False, int8=False,
                          int8c=False):
    def body(labA, gt1a, gt2a, rowsA, colsA, blendA,
             labB, gt1b, gt2b, rowsB, colsB, blendB,
             embA_ref, gA_ref, vA_ref, embB_ref, gB_ref, vB_ref,
             e8A_ref, seA_ref, e8B_ref, seB_ref, w0_ref,
             s0_ref,
             ce1a, neg1a, ce2a, neg2a, logz1a, logz2a,
             ce1b, neg1b, ce2b, neg2b, logz1b, logz2b,
             topk1a, topk2a, topk1b, topk2b,
             *rest):
        (m1a, s1a, t1a, m2a, s2a, t2a,
         m1b, s1b, t1b, m2b, s2b, t2b) = rest
        t = pl.program_id(0)
        n_t = pl.num_programs(0)

        @pl.when(t == 0)
        def _init():
            for m_scr, s_scr, t_scr in ((m1a, s1a, t1a), (m2a, s2a, t2a),
                                        (m1b, s1b, t1b), (m2b, s2b, t2b)):
                m_scr[:] = jnp.full((b, 1), NEG_INF, jnp.float32)
                s_scr[:] = jnp.zeros((b, 1), jnp.float32)
                t_scr[:] = jnp.full((b, k), NEG_INF, jnp.float32)

        col = t * tile + jax.lax.broadcasted_iota(jnp.int32, (b, tile), 1)
        valid = col < c
        w0_raw = w0_ref[0]
        s_lane = s0_ref[0:1, :] if s0_ref is not None else None
        e8A = (e8A_ref[:], seA_ref[:]) if e8A_ref is not None else None
        e8B = (e8B_ref[:], seB_ref[:]) if e8B_ref is not None else None
        args = (b, c, tile, k, loss_type, margin, scale, mask_svfc, mxu_bf16,
                t, n_t, col, valid, w0_raw, s_lane)
        # Arc/AM: the shared-stream body (one negative logsumexp per
        # direction, per-view target terms analytic) — at production scales
        # the fixed-reference z-unit variant (_FIXED_REF_MAX_SCALE); SV
        # modifies non-target columns per view and keeps the two-stream body
        if loss_type == "SV":
            dir_fwd = _quad_dir_fwd
        elif scale <= _FIXED_REF_MAX_SCALE:
            dir_fwd = _quad_dir_fwd_shared_zfix
        else:
            dir_fwd = _quad_dir_fwd_shared

        def run_dirs():
            dir_fwd(*args, labA, gt1a, gt2a, rowsA, colsA, blendA,
                    embA_ref, gA_ref, vA_ref,
                    (m1a, s1a, t1a), (m2a, s2a, t2a),
                    (ce1a, neg1a, logz1a, topk1a),
                    (ce2a, neg2a, logz2a, topk2a), partial_out=partial_out,
                    e8=e8A)
            dir_fwd(*args, labB, gt1b, gt2b, rowsB, colsB, blendB,
                    embB_ref, gB_ref, vB_ref,
                    (m1b, s1b, t1b), (m2b, s2b, t2b),
                    (ce1b, neg1b, logz1b, topk1b),
                    (ce2b, neg2b, logz2b, topk2b), partial_out=partial_out,
                    e8=e8B)

        if ((_STACKED or (_STACKED_AUTO
                 and (e8A is not None or s_lane is None)))
                and dir_fwd is _quad_dir_fwd_shared_zfix
                and not partial_out and b % 8 == 0):
            in_range = lambda cv: jnp.any(  # noqa: E731
                (cv >= t * tile) & (cv < t * tile + tile))
            fast = (jnp.logical_not(in_range(colsA[:][:, 0]))
                    & jnp.logical_not(in_range(colsB[:][:, 0]))
                    & (t != n_t - 1))

            @pl.when(fast)
            def _fast():
                _quad_stacked_clean_fwd(
                    b, c, tile, k, scale, t, w0_raw, s_lane, mxu_bf16,
                    labA[:], labB[:], embA_ref[:], embB_ref[:], e8A, e8B,
                    ((m1a, s1a, t1a), (m2a, s2a, t2a)),
                    ((m1b, s1b, t1b), (m2b, s2b, t2b)))

            @pl.when(jnp.logical_not(fast))
            def _slow():
                run_dirs()
        else:
            run_dirs()

    return _splice_optional(body, 18, int8c=int8c, int8=int8)


def _quad_dir_bwd(b, d, c, tile, kw, mxu_bf16, t, col, valid, w0_raw, s_lane,
                  lab_ref, rows_ref, cols_ref, blend_ref,
                  gt1_ref, gt2_ref, logz1_ref, logz2_ref, kth1_ref, kth2_ref,
                  dce1_ref, dneg1_ref, dce2_ref, dneg2_ref,
                  emb_ref, g_ref, v_ref, demb_scr, dgt1_scr, dgt2_scr,
                  e8=None):
    """One direction's per-tile backward work (the twin bwd body)."""
    labels = lab_ref[:]
    pos = labels >= 0
    emb = emb_ref[:].astype(jnp.float32)
    cols_v = cols_ref[:][:, 0]

    def view_dcs(cos1, cos2):
        dc1, dg1 = _view_dcos(cos1, col, valid, labels, pos, gt1_ref[:],
                              logz1_ref[:], kth1_ref[:], dce1_ref[:],
                              dneg1_ref[:], **kw)
        dc2, dg2 = _view_dcos(cos2, col, valid, labels, pos, gt2_ref[:],
                              logz2_ref[:], kth2_ref[:], dce2_ref[:],
                              dneg2_ref[:], **kw)
        dgt1_scr[:] = dgt1_scr[:] + dg1
        dgt2_scr[:] = dgt2_scr[:] + dg2
        return dc1, dc2

    tile_hit = jnp.any((cols_v >= t * tile) & (cols_v < t * tile + tile))

    @pl.when(tile_hit)
    def _written_tile():
        if s_lane is not None:
            oh = _lane_write_onehots(rows_ref[:], cols_ref[:], blend_ref[:],
                                     t, tile)
            cos1, cos2 = _int8_written_cos(emb, w0_raw, s_lane, g_ref[:],
                                           v_ref[:], oh, e8=e8)
            dc1, dc2 = view_dcs(cos1, cos2)
            demb_scr[:] = demb_scr[:] + _int8_written_demb(
                dc1, dc2, w0_raw, s_lane, g_ref[:], v_ref[:], oh)
            return
        w0e, wbe = effective_tile_views(
            w0_raw.astype(jnp.float32), col[0],
            g_ref[:].astype(jnp.float32), rows_ref[:][:, 0], cols_v,
            v_ref[:].astype(jnp.float32), blend_ref[:][:, 0],
            mxu_bf16=mxu_bf16)
        e_op, w0_op = _mxu_pair(emb, w0e, mxu_bf16)
        _, wb_op = _mxu_pair(emb, wbe, mxu_bf16)
        cos1 = jnp.dot(e_op, w0_op.T, preferred_element_type=jnp.float32)
        cos2 = jnp.dot(e_op, wb_op.T, preferred_element_type=jnp.float32)
        dc1, dc2 = view_dcs(cos1, cos2)
        dc1_op, _ = _mxu_pair(dc1, dc1, mxu_bf16)
        dc2_op, _ = _mxu_pair(dc2, dc2, mxu_bf16)
        demb_scr[:] = demb_scr[:] \
            + jnp.dot(dc1_op, w0_op, preferred_element_type=jnp.float32) \
            + jnp.dot(dc2_op, wb_op, preferred_element_type=jnp.float32)

    @pl.when(jnp.logical_not(tile_hit))
    def _clean_tile():
        cos = _cos_tile(emb, w0_raw, s_lane, mxu_bf16, e8=e8)
        dc1, dc2 = view_dcs(cos, cos)
        demb_scr[:] = demb_scr[:] + _demb_clean(dc1 + dc2, w0_raw, s_lane,
                                                mxu_bf16)


def _make_quad_bwd_kernel(b, d, c, tile, k, loss_type, margin, scale, mask_svfc,
                          mxu_bf16=False, int8=False, int8c=False):
    kw = dict(loss_type=loss_type, margin=margin, scale=scale, k=k,
              mask_svfc=mask_svfc)

    def body(labA, rowsA, colsA, blendA,
             gt1a, gt2a, logz1a, logz2a, kth1a, kth2a,
             dce1a, dneg1a, dce2a, dneg2a,
             labB, rowsB, colsB, blendB,
             gt1b, gt2b, logz1b, logz2b, kth1b, kth2b,
             dce1b, dneg1b, dce2b, dneg2b,
             embA_ref, gA_ref, vA_ref, embB_ref, gB_ref, vB_ref,
             e8A_ref, seA_ref, e8B_ref, seB_ref, w0_ref,
             s0_ref,
             dembA_ref, dgt1a_ref, dgt2a_ref,
             dembB_ref, dgt1b_ref, dgt2b_ref,
             dembA_scr, dgt1a_scr, dgt2a_scr,
             dembB_scr, dgt1b_scr, dgt2b_scr):
        t = pl.program_id(0)
        n_t = pl.num_programs(0)

        @pl.when(t == 0)
        def _init():
            for scr in (dembA_scr, dembB_scr):
                scr[:] = jnp.zeros((b, d), jnp.float32)
            for scr in (dgt1a_scr, dgt2a_scr, dgt1b_scr, dgt2b_scr):
                scr[:] = jnp.zeros((b, 1), jnp.float32)

        col = t * tile + jax.lax.broadcasted_iota(jnp.int32, (b, tile), 1)
        valid = col < c
        w0_raw = w0_ref[0]
        s_lane = s0_ref[0:1, :] if s0_ref is not None else None
        e8A = (e8A_ref[:], seA_ref[:]) if e8A_ref is not None else None
        e8B = (e8B_ref[:], seB_ref[:]) if e8B_ref is not None else None
        args = (b, d, c, tile, kw, mxu_bf16, t, col, valid, w0_raw, s_lane)
        if kw["loss_type"] == "SV":
            _quad_dir_bwd(*args, labA, rowsA, colsA, blendA,
                          gt1a, gt2a, logz1a, logz2a, kth1a, kth2a,
                          dce1a, dneg1a, dce2a, dneg2a,
                          embA_ref, gA_ref, vA_ref, dembA_scr, dgt1a_scr,
                          dgt2a_scr, e8=e8A)
            _quad_dir_bwd(*args, labB, rowsB, colsB, blendB,
                          gt1b, gt2b, logz1b, logz2b, kth1b, kth2b,
                          dce1b, dneg1b, dce2b, dneg2b,
                          embB_ref, gB_ref, vB_ref, dembB_scr, dgt1b_scr,
                          dgt2b_scr, e8=e8B)
        else:
            def run_dirs():
                _quad_dir_bwd_shared(*args, labA, rowsA, colsA, blendA,
                                     gt1a, gt2a, logz1a, logz2a, kth1a,
                                     kth2a, dce1a, dneg1a, dce2a, dneg2a,
                                     embA_ref, gA_ref, vA_ref, dembA_scr,
                                     dgt1a_scr, dgt2a_scr, n_t, e8=e8A)
                _quad_dir_bwd_shared(*args, labB, rowsB, colsB, blendB,
                                     gt1b, gt2b, logz1b, logz2b, kth1b,
                                     kth2b, dce1b, dneg1b, dce2b, dneg2b,
                                     embB_ref, gB_ref, vB_ref, dembB_scr,
                                     dgt1b_scr, dgt2b_scr, n_t, e8=e8B)

            if ((_STACKED or (_STACKED_AUTO
                 and (e8A is not None or s_lane is None)))
                    and b % 8 == 0):
                in_range = lambda cv: jnp.any(  # noqa: E731
                    (cv >= t * tile) & (cv < t * tile + tile))
                fast = (jnp.logical_not(in_range(colsA[:][:, 0]))
                        & jnp.logical_not(in_range(colsB[:][:, 0]))
                        & (t != n_t - 1))

                @pl.when(fast)
                def _fast():
                    _quad_stacked_clean_bwd(
                        b, c, tile, k, scale, t, w0_raw, s_lane, mxu_bf16,
                        labA[:], labB[:], embA_ref[:], embB_ref[:], e8A, e8B,
                        (logz1a[:], logz2a[:], dce1a[:], dce2a[:],
                         dneg1a[:], dneg2a[:], kth1a[:], kth2a[:]),
                        (logz1b[:], logz2b[:], dce1b[:], dce2b[:],
                         dneg1b[:], dneg2b[:], kth1b[:], kth2b[:]),
                        dembA_scr, dembB_scr)

                @pl.when(jnp.logical_not(fast))
                def _slow():
                    run_dirs()
            else:
                run_dirs()

        @pl.when(t == n_t - 1)
        def _finalize():
            dembA_ref[:] = dembA_scr[:]
            dgt1a_ref[:] = dgt1a_scr[:]
            dgt2a_ref[:] = dgt2a_scr[:]
            dembB_ref[:] = dembB_scr[:]
            dgt1b_ref[:] = dgt1b_scr[:]
            dgt2b_ref[:] = dgt2b_scr[:]

    return _splice_optional(body, 34, int8c=int8c, int8=int8)


def _dir_inputs(queue, g, rows, cols, seen, qscales=None):
    """(g32, rows_i, cols_i, v, blend) carrier pack for one direction."""
    cols_i = cols.astype(jnp.int32)
    rows_i = rows.astype(jnp.int32)
    g32 = g.astype(jnp.float32)
    v, blend_b = twin_write_values(_gather_plane_deq(queue, qscales, 1, cols_i),
                                   g32, rows_i, cols_i,
                                   seen.astype(jnp.float32))
    return g32, rows_i, cols_i, v, blend_b


# ----------------------------------------------------------------------
# per-shard partial quad kernels (parallel/sharded_quad.py): both
# directions in ONE pass over the LOCAL queue rows; inputs pre-localized
# like the twin partials (lcols/-1, labels -1/-2 sentinels; global gt).
# Arc/AM emit the shared NEGATIVE-stream state (target excluded on its
# owner shard — the composition adds the analytic target term after the
# collective merge); SV emits the per-view target-included state (merge
# like the sharded twin).


def pallas_quad_partial_fwd(emb_x, emb_y, q_local, dir_a, dir_b, *,
                            loss_type, margin, scale, k, mask_svfc, tile=512,
                            interpret=False, mxu_bf16=False, qscales=None,
                            int8_compute=False):
    """dir_a/dir_b = (g32, rows_i, lcol, v, blend_b, labels_l, gt1, gt2).
    ``qscales`` is the shard's LOCAL [2, Q/m] dequant scales for int8
    queues (ops/qqueue.py); ``int8_compute`` additionally quantizes the
    LOCAL probe rows and streams the clean-tile dots int8×int8→int32
    (per-row quantization is shard-independent, so the data-sharded probes
    quantize identically to the single-shard path). Returns per direction
    ((m1, s1, topk1), (m2, s2, topk2))."""
    b, d = emb_x.shape
    gA32, rowsA, lcolA, vA, blendA, labA, gt1a, gt2a = dir_a
    gB32, rowsB, lcolB, vB, blendB, labB, gt1b, gt2b = dir_b
    bp = rowsA.shape[0]
    c = q_local.shape[1]
    tile = _fit_tile(c, _twin_tile(max(b, bp), d, tile,
                                   qbytes=q_local.dtype.itemsize))
    qp, n_tiles = _pad_queue(q_local, c, tile)
    s_ops, s_specs = _scale_operand(qscales, c, tile)
    e8_ops, e8_specs = _e8_operands(emb_x, emb_y, int8_compute)
    kernel = _make_quad_fwd_kernel(b, d, c, tile, k, loss_type, margin, scale,
                                   mask_svfc, mxu_bf16=mxu_bf16,
                                   partial_out=True, int8=qscales is not None,
                                   int8c=int8_compute)
    n_in = 19 + len(e8_ops) + len(s_ops)

    def adapter(*refs):
        ins = refs[:n_in]
        (m1a, s1a, m2a, s2a, m1b, s1b, m2b, s2b,
         t1a, t2a, t1b, t2b, *scratch) = refs[n_in:]
        kernel(*ins,
               m1a, s1a, m2a, s2a, None, None,
               m1b, s1b, m2b, s2b, None, None,
               t1a, t2a, t1b, t2b, *scratch)

    vec = lambda x, dt=jnp.float32: x[:, None].astype(dt)  # noqa: E731
    bspec = pl.BlockSpec((b, 1), lambda t: (0, 0), memory_space=pltpu.VMEM)
    pspec = pl.BlockSpec((bp, 1), lambda t: (0, 0), memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda t: (0, 0), memory_space=pltpu.VMEM)  # noqa: E731
    dir_specs = [bspec] * 3 + [pspec] * 3
    out = pl.pallas_call(
        adapter,
        grid=(n_tiles,),
        in_specs=dir_specs + dir_specs + [
            full((b, d)), full((bp, d)), full((bp, d)),
            full((b, d)), full((bp, d)), full((bp, d)),
        ] + list(e8_specs) + [
            pl.BlockSpec((1, tile, d), lambda t: (0, t, 0), memory_space=pltpu.VMEM),
        ] + list(s_specs),
        out_specs=[bspec] * 8 + [full((b, k))] * 4,
        out_shape=[jax.ShapeDtypeStruct((b, 1), jnp.float32)] * 8
        + [jax.ShapeDtypeStruct((b, k), jnp.float32)] * 4,
        scratch_shapes=(
            [pltpu.VMEM((b, 1), jnp.float32), pltpu.VMEM((b, 1), jnp.float32),
             pltpu.VMEM((b, k), jnp.float32)] * 4
        ),
        interpret=interpret,
    )(labA.astype(jnp.int32)[:, None], vec(gt1a), vec(gt2a),
      rowsA[:, None], lcolA.astype(jnp.int32)[:, None],
      blendA.astype(jnp.int32)[:, None],
      labB.astype(jnp.int32)[:, None], vec(gt1b), vec(gt2b),
      rowsB[:, None], lcolB.astype(jnp.int32)[:, None],
      blendB.astype(jnp.int32)[:, None],
      emb_x.astype(jnp.float32), gA32, vA,
      emb_y.astype(jnp.float32), gB32, vB, *e8_ops, qp, *s_ops)
    (m1a, s1a, m2a, s2a, m1b, s1b, m2b, s2b, t1a, t2a, t1b, t2b) = out
    col0 = lambda v: v[:, 0]  # noqa: E731
    return (((col0(m1a), col0(s1a), t1a), (col0(m2a), col0(s2a), t2a)),
            ((col0(m1b), col0(s1b), t1b), (col0(m2b), col0(s2b), t2b)))


def pallas_quad_partial_bwd(emb_x, emb_y, q_local, dir_a, dir_b,
                            globals_a, globals_b, *, loss_type, margin, scale,
                            k, mask_svfc, tile=512, interpret=False,
                            mxu_bf16=False, qscales=None, int8_compute=False):
    """dir_* = (g32, rows_i, lcol, v, blend_b, labels_l, gt1, gt2);
    globals_* = (logz1, logz2, kth1, kth2, d_ce1, d_neg1, d_ce2, d_neg2)
    — all GLOBAL, cotangents pre-masked with the global pos split.
    Returns (d_emb_x, dgt1a, dgt2a, d_emb_y, dgt1b, dgt2b) — demb are
    LOCAL partials; dgt are raw OWNER-SHARD values (Arc/AM compute them
    analytically but only where the localized label is ≥ 0, i.e. on the
    owner; SV accumulates target-column dz per tile) — psum over the model
    axis recovers the global dgt in both cases."""
    b, d = emb_x.shape
    gA32, rowsA, lcolA, vA, blendA, labA, gt1a, gt2a = dir_a
    gB32, rowsB, lcolB, vB, blendB, labB, gt1b, gt2b = dir_b
    bp = rowsA.shape[0]
    c = q_local.shape[1]
    tile = _fit_tile(c, _twin_tile(max(b, bp), d, tile,
                                   qbytes=q_local.dtype.itemsize))
    qp, n_tiles = _pad_queue(q_local, c, tile)
    s_ops, s_specs = _scale_operand(qscales, c, tile)
    e8_ops, e8_specs = _e8_operands(emb_x, emb_y, int8_compute)
    kernel = _make_quad_bwd_kernel(b, d, c, tile, k, loss_type, margin, scale,
                                   mask_svfc, mxu_bf16=mxu_bf16,
                                   int8=qscales is not None,
                                   int8c=int8_compute)
    logz1a, logz2a, kth1a, kth2a, dce1a, dneg1a, dce2a, dneg2a = globals_a
    logz1b, logz2b, kth1b, kth2b, dce1b, dneg1b, dce2b, dneg2b = globals_b
    vec = lambda x: x[:, None].astype(jnp.float32)  # noqa: E731
    bspec = pl.BlockSpec((b, 1), lambda t: (0, 0), memory_space=pltpu.VMEM)
    pspec = pl.BlockSpec((bp, 1), lambda t: (0, 0), memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda t: (0, 0), memory_space=pltpu.VMEM)  # noqa: E731
    dir_specs = [bspec] + [pspec] * 3 + [bspec] * 10
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=dir_specs + dir_specs + [
            full((b, d)), full((bp, d)), full((bp, d)),
            full((b, d)), full((bp, d)), full((bp, d)),
        ] + list(e8_specs) + [
            pl.BlockSpec((1, tile, d), lambda t: (0, t, 0), memory_space=pltpu.VMEM),
        ] + list(s_specs),
        out_specs=[full((b, d)), bspec, bspec, full((b, d)), bspec, bspec],
        out_shape=[
            jax.ShapeDtypeStruct((b, d), jnp.float32),
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, d), jnp.float32),
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, d), jnp.float32),
            pltpu.VMEM((b, 1), jnp.float32), pltpu.VMEM((b, 1), jnp.float32),
            pltpu.VMEM((b, d), jnp.float32),
            pltpu.VMEM((b, 1), jnp.float32), pltpu.VMEM((b, 1), jnp.float32),
        ],
        interpret=interpret,
    )(labA.astype(jnp.int32)[:, None], rowsA[:, None],
      lcolA.astype(jnp.int32)[:, None], blendA.astype(jnp.int32)[:, None],
      vec(gt1a), vec(gt2a), vec(logz1a), vec(logz2a), vec(kth1a), vec(kth2a),
      vec(dce1a), vec(dneg1a), vec(dce2a), vec(dneg2a),
      labB.astype(jnp.int32)[:, None], rowsB[:, None],
      lcolB.astype(jnp.int32)[:, None], blendB.astype(jnp.int32)[:, None],
      vec(gt1b), vec(gt2b), vec(logz1b), vec(logz2b), vec(kth1b), vec(kth2b),
      vec(dce1b), vec(dneg1b), vec(dce2b), vec(dneg2b),
      emb_x.astype(jnp.float32), gA32, vA,
      emb_y.astype(jnp.float32), gB32, vB, *e8_ops, qp, *s_ops)
    d_emb_x, dgt1a_o, dgt2a_o, d_emb_y, dgt1b_o, dgt2b_o = out
    return (d_emb_x, dgt1a_o[:, 0], dgt2a_o[:, 0],
            d_emb_y, dgt1b_o[:, 0], dgt2b_o[:, 0])


def _e8_operands(emb_x, emb_y, int8_compute):
    """(operands, specs) for the int8-COMPUTE probe refs: per-row-quantized
    emb_x/emb_y (ops/qqueue.py) + their [B, 1] dequant scales. Empty when
    the mode is off."""
    if not int8_compute:
        return (), ()
    from vlsfr_tpu.ops.qqueue import quantize_rows

    b, d = emb_x.shape
    e8x, sx = quantize_rows(emb_x.astype(jnp.float32))
    e8y, sy = quantize_rows(emb_y.astype(jnp.float32))
    full = lambda shape: pl.BlockSpec(shape, lambda t: (0, 0),  # noqa: E731
                                      memory_space=pltpu.VMEM)
    ops = (e8x, sx[:, None].astype(jnp.float32),
           e8y, sy[:, None].astype(jnp.float32))
    specs = (full((b, d)), full((b, 1)), full((b, d)), full((b, 1)))
    return ops, specs


def pallas_quad_fwd(emb_x, emb_y, queue, g_a, g_b, plan_a, plan_b,
                    labels_a, labels_b, gts_a, gts_b, *,
                    loss_type, margin, scale, k, mask_svfc, tile=512,
                    interpret=False, qscales=None, int8_compute=False):
    b, d = emb_x.shape
    c = queue.shape[1]
    tile = _fit_tile(c, _twin_tile(b, d, tile, qbytes=queue.dtype.itemsize))
    qp, n_tiles = _pad_queue(queue, c, tile)
    s_ops, s_specs = _scale_operand(qscales, c, tile)
    e8_ops, e8_specs = _e8_operands(emb_x, emb_y, int8_compute)
    kernel = _make_quad_fwd_kernel(b, d, c, tile, k, loss_type, margin, scale,
                                   mask_svfc, mxu_bf16=queue.dtype == jnp.bfloat16,
                                   int8=qscales is not None,
                                   int8c=int8_compute)
    gA32, rowsA, colsA, vA, blendA = _dir_inputs(queue, g_a, *plan_a, qscales=qscales)
    gB32, rowsB, colsB, vB, blendB = _dir_inputs(queue, g_b, *plan_b, qscales=qscales)
    gt1a, gt2a = gts_a
    gt1b, gt2b = gts_b
    vec = lambda v, dt=jnp.float32: v[:, None].astype(dt)  # noqa: E731
    bspec = pl.BlockSpec((b, 1), lambda t: (0, 0), memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda t: (0, 0), memory_space=pltpu.VMEM)  # noqa: E731
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[bspec] * 12 + [full((b, d))] * 6 + list(e8_specs) + [
            pl.BlockSpec((1, tile, d), lambda t: (0, t, 0), memory_space=pltpu.VMEM),
        ] + list(s_specs),
        out_specs=[bspec] * 12 + [full((b, k))] * 4,
        out_shape=[jax.ShapeDtypeStruct((b, 1), jnp.float32)] * 12
        + [jax.ShapeDtypeStruct((b, k), jnp.float32)] * 4,
        scratch_shapes=(
            [pltpu.VMEM((b, 1), jnp.float32), pltpu.VMEM((b, 1), jnp.float32),
             pltpu.VMEM((b, k), jnp.float32)] * 4
        ),
        interpret=interpret,
    )(labels_a.astype(jnp.int32)[:, None], vec(gt1a), vec(gt2a),
      rowsA[:, None], colsA[:, None], blendA.astype(jnp.int32)[:, None],
      labels_b.astype(jnp.int32)[:, None], vec(gt1b), vec(gt2b),
      rowsB[:, None], colsB[:, None], blendB.astype(jnp.int32)[:, None],
      emb_x.astype(jnp.float32), gA32, vA,
      emb_y.astype(jnp.float32), gB32, vB, *e8_ops, qp, *s_ops)
    (ce1a, neg1a, ce2a, neg2a, logz1a, logz2a,
     ce1b, neg1b, ce2b, neg2b, logz1b, logz2b,
     topk1a, topk2a, topk1b, topk2b) = out[:16]
    col0 = lambda v: v[:, 0]  # noqa: E731
    res = (col0(logz1a), col0(logz2a), col0(logz1b), col0(logz2b),
           topk1a, topk2a, topk1b, topk2b)
    return ((col0(ce1a), col0(neg1a), col0(ce2a), col0(neg2a),
             col0(ce1b), col0(neg1b), col0(ce2b), col0(neg2b)), res)


def pallas_quad_bwd(emb_x, emb_y, queue, g_a, g_b, plan_a, plan_b,
                    labels_a, labels_b, gts_a, gts_b, logzs, topks,
                    cots_a, cots_b, *, loss_type, margin, scale, k, mask_svfc,
                    tile=512, interpret=False, qscales=None,
                    int8_compute=False):
    b, d = emb_x.shape
    c = queue.shape[1]
    tile = _fit_tile(c, _twin_tile(b, d, tile, qbytes=queue.dtype.itemsize))
    qp, n_tiles = _pad_queue(queue, c, tile)
    s_ops, s_specs = _scale_operand(qscales, c, tile)
    e8_ops, e8_specs = _e8_operands(emb_x, emb_y, int8_compute)
    kernel = _make_quad_bwd_kernel(b, d, c, tile, k, loss_type, margin, scale,
                                   mask_svfc, mxu_bf16=queue.dtype == jnp.bfloat16,
                                   int8=qscales is not None,
                                   int8c=int8_compute)
    gA32, rowsA, colsA, vA, blendA = _dir_inputs(queue, g_a, *plan_a, qscales=qscales)
    gB32, rowsB, colsB, vB, blendB = _dir_inputs(queue, g_b, *plan_b, qscales=qscales)
    gt1a, gt2a = gts_a
    gt1b, gt2b = gts_b
    logz1a, logz2a, logz1b, logz2b = logzs
    topk1a, topk2a, topk1b, topk2b = topks
    d_ce1a, d_neg1a, d_ce2a, d_neg2a = cots_a
    d_ce1b, d_neg1b, d_ce2b, d_neg2b = cots_b

    def masked(labels, d_ce1, d_neg1, d_ce2, d_neg2):
        pos = labels >= 0
        return (jnp.where(pos, d_ce1, 0.0), jnp.where(pos, 0.0, d_neg1),
                jnp.where(pos, d_ce2, 0.0), jnp.where(pos, 0.0, d_neg2))

    d_ce1a, d_neg1a, d_ce2a, d_neg2a = masked(labels_a, d_ce1a, d_neg1a, d_ce2a, d_neg2a)
    d_ce1b, d_neg1b, d_ce2b, d_neg2b = masked(labels_b, d_ce1b, d_neg1b, d_ce2b, d_neg2b)
    vec = lambda v: v[:, None].astype(jnp.float32)  # noqa: E731
    bspec = pl.BlockSpec((b, 1), lambda t: (0, 0), memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda t: (0, 0), memory_space=pltpu.VMEM)  # noqa: E731
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[bspec] * 28 + [full((b, d))] * 6 + list(e8_specs) + [
            pl.BlockSpec((1, tile, d), lambda t: (0, t, 0), memory_space=pltpu.VMEM),
        ] + list(s_specs),
        out_specs=[full((b, d)), bspec, bspec, full((b, d)), bspec, bspec],
        out_shape=[
            jax.ShapeDtypeStruct((b, d), jnp.float32),
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, d), jnp.float32),
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, d), jnp.float32),
            pltpu.VMEM((b, 1), jnp.float32), pltpu.VMEM((b, 1), jnp.float32),
            pltpu.VMEM((b, d), jnp.float32),
            pltpu.VMEM((b, 1), jnp.float32), pltpu.VMEM((b, 1), jnp.float32),
        ],
        interpret=interpret,
    )(labels_a.astype(jnp.int32)[:, None], rowsA[:, None], colsA[:, None],
      blendA.astype(jnp.int32)[:, None],
      vec(gt1a), vec(gt2a), vec(logz1a), vec(logz2a),
      vec(topk1a[:, -1]), vec(topk2a[:, -1]),
      vec(d_ce1a), vec(d_neg1a), vec(d_ce2a), vec(d_neg2a),
      labels_b.astype(jnp.int32)[:, None], rowsB[:, None], colsB[:, None],
      blendB.astype(jnp.int32)[:, None],
      vec(gt1b), vec(gt2b), vec(logz1b), vec(logz2b),
      vec(topk1b[:, -1]), vec(topk2b[:, -1]),
      vec(d_ce1b), vec(d_neg1b), vec(d_ce2b), vec(d_neg2b),
      emb_x.astype(jnp.float32), gA32, vA,
      emb_y.astype(jnp.float32), gB32, vB, *e8_ops, qp, *s_ops)
    d_emb_x, dgt1a, dgt2a, d_emb_y, dgt1b, dgt2b = out
    d_emb_x = _twin_gt_tail(emb_x, queue, g_a, *plan_a, labels_a, gt1a, gt2a,
                            dgt1a[:, 0], dgt2a[:, 0], d_emb_x, loss_type,
                            margin, qscales=qscales)
    d_emb_y = _twin_gt_tail(emb_y, queue, g_b, *plan_b, labels_b, gt1b, gt2b,
                            dgt1b[:, 0], dgt2b[:, 0], d_emb_y, loss_type,
                            margin, qscales=qscales)
    return d_emb_x, d_emb_y


@partial(jax.custom_vjp,
         nondiff_argnums=(14, 15, 16, 17, 18, 19, 20, 21))
def fused_quad_margin(emb_x, emb_y, queue, qscales, g_a, g_b, rows_a, cols_a,
                      seen_a, rows_b, cols_b, seen_b, labels_a, labels_b,
                      loss_type="Arc", margin=0.5, scale=32.0, hard_neg=10,
                      mask_svfc=1.2, tile=512, use_pallas="auto",
                      int8_compute=False):
    """Both FFC directions' per-row (ce1, neg1, ce2, neg2) — 8 outputs —
    in ONE streaming pass over q0 (A: probe emb_x vs write plan
    (g_a, rows_a, cols_a, seen_a); B: probe emb_y vs plan b).
    ``qscales`` is the [2, Q] per-row scale array for int8-stored queues
    (ops/qqueue.py), None otherwise. Differentiable w.r.t. emb_x/emb_y
    only. (A one-pass variant — fwd accumulating weighted queue sums so
    the bwd never re-streams the queue — was built, measured SLOWER at
    step level on both int8 and f32 queues, and removed; docs/PERF.md
    "Step-level A/B result".)"""
    out, _ = _quad_fwd_impl(emb_x, emb_y, queue, qscales, g_a, g_b, rows_a,
                            cols_a, seen_a, rows_b, cols_b, seen_b, labels_a,
                            labels_b, loss_type, margin, scale, hard_neg,
                            mask_svfc, tile, use_pallas, int8_compute)
    return out


def _quad_fwd_impl(emb_x, emb_y, queue, qscales, g_a, g_b, rows_a, cols_a,
                   seen_a, rows_b, cols_b, seen_b, labels_a, labels_b,
                   loss_type, margin, scale, hard_neg, mask_svfc, tile,
                   use_pallas, int8_compute=False, gts=None):
    if gts is None:
        gts = (compute_twin_gt(emb_x, queue, g_a, rows_a, cols_a, seen_a,
                               labels_a, qscales=qscales),
               compute_twin_gt(emb_y, queue, g_b, rows_b, cols_b, seen_b,
                               labels_b, qscales=qscales))
    gts_a, gts_b = gts
    if use_pallas == "auto":
        use_pallas = jax.default_backend() == "tpu"
    kw = dict(loss_type=loss_type, margin=margin, scale=scale, k=hard_neg,
              mask_svfc=mask_svfc, tile=tile)
    if use_pallas:
        out, res = pallas_quad_fwd(emb_x, emb_y, queue, g_a, g_b,
                                   (rows_a, cols_a, seen_a), (rows_b, cols_b, seen_b),
                                   labels_a, labels_b, gts_a, gts_b,
                                   qscales=qscales, int8_compute=int8_compute,
                                   **kw)
    else:
        # scan fallback: two independent twin streams (CPU path — no fusion win)
        out_a, res_a = _twin_stream_fwd(emb_x, queue, g_a, rows_a, cols_a, seen_a,
                                        labels_a, *gts_a, qscales=qscales, **kw)
        out_b, res_b = _twin_stream_fwd(emb_y, queue, g_b, rows_b, cols_b, seen_b,
                                        labels_b, *gts_b, qscales=qscales, **kw)
        logz1a, logz2a, topk1a, topk2a = res_a
        logz1b, logz2b, topk1b, topk2b = res_b
        out = out_a + out_b
        res = (logz1a, logz2a, logz1b, logz2b, topk1a, topk2a, topk1b, topk2b)
    # streaming top-1 hits per direction (view 1) — see _twin_fwd_impl
    topk1a, topk1b = res[4], res[6]
    hit_a = ((gts_a[0] + KTH_TIE_TOL >= topk1a[:, 0])
             & (labels_a >= 0)).astype(jnp.float32)
    hit_b = ((gts_b[0] + KTH_TIE_TOL >= topk1b[:, 0])
             & (labels_b >= 0)).astype(jnp.float32)
    return out + (hit_a, hit_b), res


def _quad_vjp_fwd(emb_x, emb_y, queue, qscales, g_a, g_b, rows_a, cols_a,
                  seen_a, rows_b, cols_b, seen_b, labels_a, labels_b,
                  loss_type, margin, scale, hard_neg, mask_svfc, tile,
                  use_pallas, int8_compute):
    gts = (compute_twin_gt(emb_x, queue, g_a, rows_a, cols_a, seen_a, labels_a,
                           qscales=qscales),
           compute_twin_gt(emb_y, queue, g_b, rows_b, cols_b, seen_b, labels_b,
                           qscales=qscales))
    out, res = _quad_fwd_impl(emb_x, emb_y, queue, qscales, g_a, g_b, rows_a,
                              cols_a, seen_a, rows_b, cols_b, seen_b, labels_a,
                              labels_b, loss_type, margin, scale, hard_neg,
                              mask_svfc, tile, use_pallas, int8_compute,
                              gts=gts)
    (logz1a, logz2a, logz1b, logz2b,
     topk1a, topk2a, topk1b, topk2b) = res
    return out, (emb_x, emb_y, queue, qscales, g_a, g_b, rows_a, cols_a, seen_a,
                 rows_b, cols_b, seen_b, labels_a, labels_b, gts,
                 (logz1a, logz2a, logz1b, logz2b),
                 (topk1a, topk2a, topk1b, topk2b))


def _quad_vjp_bwd(loss_type, margin, scale, hard_neg, mask_svfc, tile,
                  use_pallas, int8_compute, res, cots):
    (emb_x, emb_y, queue, qscales, g_a, g_b, rows_a, cols_a, seen_a,
     rows_b, cols_b, seen_b, labels_a, labels_b, gts, logzs, topks) = res
    (d_ce1a, d_neg1a, d_ce2a, d_neg2a,
     d_ce1b, d_neg1b, d_ce2b, d_neg2b, _d_hit_a, _d_hit_b) = cots
    gts_a, gts_b = gts
    if use_pallas == "auto":
        use_pallas = jax.default_backend() == "tpu"
    kw = dict(loss_type=loss_type, margin=margin, scale=scale, k=hard_neg,
              mask_svfc=mask_svfc, tile=tile)
    if use_pallas:
        d_emb_x, d_emb_y = pallas_quad_bwd(
            emb_x, emb_y, queue, g_a, g_b,
            (rows_a, cols_a, seen_a), (rows_b, cols_b, seen_b),
            labels_a, labels_b, gts_a, gts_b, logzs, topks,
            (d_ce1a, d_neg1a, d_ce2a, d_neg2a),
            (d_ce1b, d_neg1b, d_ce2b, d_neg2b), qscales=qscales,
            int8_compute=int8_compute, **kw)
    else:
        logz1a, logz2a, logz1b, logz2b = logzs
        topk1a, topk2a, topk1b, topk2b = topks
        d_emb_x = _twin_stream_bwd(emb_x, queue, g_a, rows_a, cols_a, seen_a,
                                   labels_a, *gts_a, logz1a, logz2a, topk1a,
                                   topk2a, (d_ce1a, d_neg1a), (d_ce2a, d_neg2a),
                                   qscales=qscales, **kw)
        d_emb_y = _twin_stream_bwd(emb_y, queue, g_b, rows_b, cols_b, seen_b,
                                   labels_b, *gts_b, logz1b, logz2b, topk1b,
                                   topk2b, (d_ce1b, d_neg1b), (d_ce2b, d_neg2b),
                                   qscales=qscales, **kw)
    return (d_emb_x, d_emb_y, _zero_cot(queue),
            None if qscales is None else jnp.zeros_like(qscales),
            jnp.zeros_like(g_a), jnp.zeros_like(g_b),
            None, None, None, None, None, None, None, None)


fused_quad_margin.defvjp(_quad_vjp_fwd, _quad_vjp_bwd)


def quad_add_margin(emb_x, emb_y, queue, g_a, g_b, plan_a, plan_b,
                    labels_a, labels_b, *, loss_type="Arc", margin=0.5,
                    scale=32.0, hard_neg=10, mask_svfc=1.2, tile=512,
                    use_pallas="auto", with_acc=False, qscales=None,
                    int8_compute=False):
    """(loss_a, loss_b): both FFC directional losses with ONE streaming
    pass over q0 per fwd/bwd (the reduction of each direction matches
    twin_add_margin exactly). ``with_acc`` also returns the combined
    streaming top-1 accuracy over both directions' in-pool rows.
    ``qscales`` carries the per-row scales of an int8-stored queue.
    ``int8_compute`` (int8 queues, Pallas path only) additionally
    quantizes the probes per-row and runs the streamed cos dots
    int8×int8→int32 on the MXU — 2x dot throughput; gt/target columns and
    written-slot overrides stay exact f32 (see _cos_int8_dot); the scan
    fallback ignores the flag (it computes on dequantized rows)."""
    if int8_compute and qscales is None:
        raise ValueError("int8_compute requires an int8-stored queue "
                         "(pool.queue_dtype='int8')")
    rows_a, cols_a, seen_a = plan_a
    rows_b, cols_b, seen_b = plan_b
    out = fused_quad_margin(emb_x, emb_y, queue, qscales, g_a, g_b, rows_a,
                            cols_a, seen_a, rows_b, cols_b, seen_b, labels_a,
                            labels_b, loss_type, margin, scale, hard_neg,
                            mask_svfc, tile, use_pallas, int8_compute)
    ce1a, neg1a, ce2a, neg2a, ce1b, neg1b, ce2b, neg2b, hit_a, hit_b = out

    losses = (reduce_margin_dir(ce1a, neg1a, ce2a, neg2a, labels_a),
              reduce_margin_dir(ce1b, neg1b, ce2b, neg2b, labels_b))
    if with_acc:
        n_pos = jnp.maximum(jnp.sum((labels_a >= 0).astype(jnp.float32))
                            + jnp.sum((labels_b >= 0).astype(jnp.float32)), 1.0)
        return losses, (jnp.sum(hit_a) + jnp.sum(hit_b)) / n_pos
    return losses


# ----------------------------------------------------------------------
# shared-stream direction bodies (Arc/AM): the two views of one direction
# differ ONLY at the target column (φ(gt1) vs φ(gt2)) and at this step's
# written slots. Stream the negative mass ONCE per direction with the
# target column EXCLUDED, merge the same per-tile (max, sumexp) into both
# views' accumulators, and add each view's target term analytically at
# finalize: logz_v = logaddexp(logz_neg_v, scale·φ(gt_v)). This halves
# the per-tile VPU work — which bounds the kernels once the queue DMA is
# minimized (measured: the quad route LOST to twin on bf16 queues before
# this). SV modifies NON-target columns per view (mask_svfc depends on
# gt_v), so SV keeps the two-stream bodies above.


def _quad_dir_fwd_shared(b, c, tile, k, loss_type, margin, scale, mask_svfc,
                         mxu_bf16, t, n_t, col, valid, w0_raw, s_lane,
                         lab_ref, gt1_ref, gt2_ref, rows_ref, cols_ref, blend_ref,
                         emb_ref, g_ref, v_ref,
                         scr1, scr2, out1, out2, partial_out=False, e8=None):
    labels = lab_ref[:]
    emb = emb_ref[:].astype(jnp.float32)
    cols_v = cols_ref[:][:, 0]
    is_target = col == labels
    neg_ok = valid & jnp.logical_not(is_target)

    def tile_stats(cos):
        z = jnp.where(neg_ok, scale * cos, NEG_INF)
        tm = jnp.max(z, axis=-1, keepdims=True)
        ts = jnp.sum(jnp.exp(z - tm), axis=-1, keepdims=True)
        return tm, ts

    def merge_stats(scr, tm, ts):
        m_scr, s_scr, _ = scr
        m_old = m_scr[:]
        m_new = jnp.maximum(m_old, tm)
        s_scr[:] = s_scr[:] * jnp.exp(m_old - m_new) + ts * jnp.exp(tm - m_new)
        m_scr[:] = m_new

    _extract_topk = lambda buf, width: _topk_rows(buf, k)  # noqa: E731

    def merge_topk(scr, cos):
        _, _, topk_scr = scr
        # NON-target columns only (matches the logsumexp's neg_ok): the
        # hit test gt + TOL >= topk[0] must never compare gt against the
        # kernel's own recomputation of the target column — TPU f32 dots
        # round differently from the outside-computed gt, which silently
        # killed ~half the streamed train_acc hits (loss unaffected)
        cosm = jnp.where(neg_ok, cos, NEG_INF)
        kth_cur = jnp.min(topk_scr[:], axis=-1, keepdims=True)
        needs_merge = jnp.any(jnp.max(cosm, axis=-1, keepdims=True) > kth_cur)

        @pl.when(needs_merge)
        def _merge():
            buf = jnp.concatenate([topk_scr[:], cosm], axis=-1)
            topk_scr[:] = _extract_topk(buf, k + tile)

    def merge_topk_shared(cos):
        """Clean tiles: both views see the SAME masked cos — extract the
        tile's own top-k ONCE (k passes over [b, tile] instead of
        2·k passes over [b, k+tile]), then fold the [b, k] candidates
        into each view's buffer (k passes over [b, 2k] — negligible).
        Exact: topk(buf ∪ cos) == topk(buf ∪ topk_k(cos))."""
        _, _, t1_scr = scr1
        _, _, t2_scr = scr2
        cosm = jnp.where(neg_ok, cos, NEG_INF)
        kth_min = jnp.minimum(
            jnp.min(t1_scr[:], axis=-1, keepdims=True),
            jnp.min(t2_scr[:], axis=-1, keepdims=True))
        needs = jnp.any(jnp.max(cosm, axis=-1, keepdims=True) > kth_min)

        @pl.when(needs)
        def _merge():
            cand = _extract_topk(cosm, tile)
            for t_scr in (t1_scr, t2_scr):
                t_scr[:] = _extract_topk(
                    jnp.concatenate([t_scr[:], cand], axis=-1), 2 * k)

    tile_hit = jnp.any((cols_v >= t * tile) & (cols_v < t * tile + tile))

    @pl.when(tile_hit)
    def _written_tile():
        if s_lane is not None:
            cos1, cos2 = _int8_written_cos(
                emb, w0_raw, s_lane, g_ref[:], v_ref[:],
                _lane_write_onehots(rows_ref[:], cols_ref[:], blend_ref[:],
                                    t, tile), e8=e8)
        else:
            w0e, wbe = effective_tile_views(
                w0_raw.astype(jnp.float32), col[0],
                g_ref[:].astype(jnp.float32), rows_ref[:][:, 0], cols_v,
                v_ref[:].astype(jnp.float32), blend_ref[:][:, 0],
                mxu_bf16=mxu_bf16)
            e_op, w0_op = _mxu_pair(emb, w0e, mxu_bf16)
            _, wb_op = _mxu_pair(emb, wbe, mxu_bf16)
            cos1 = jnp.dot(e_op, w0_op.T, preferred_element_type=jnp.float32)
            cos2 = jnp.dot(e_op, wb_op.T, preferred_element_type=jnp.float32)
        tm1, ts1 = tile_stats(cos1)
        tm2, ts2 = tile_stats(cos2)
        merge_stats(scr1, tm1, ts1)
        merge_stats(scr2, tm2, ts2)
        merge_topk(scr1, cos1)
        merge_topk(scr2, cos2)

    @pl.when(jnp.logical_not(tile_hit))
    def _clean_tile():
        cos = _cos_tile(emb, w0_raw, s_lane, mxu_bf16, e8=e8)
        tm, ts = tile_stats(cos)  # ONE stream for both views
        merge_stats(scr1, tm, ts)
        merge_stats(scr2, tm, ts)
        merge_topk_shared(cos)  # ONE tile-extraction for both views

    @pl.when(t == n_t - 1)
    def _finalize():
        pos = labels >= 0

        def fin(scr, gt_ref, out):
            m_scr, s_scr, topk_scr = scr
            ce_ref, neg_ref, logz_ref, topk_ref = out
            if partial_out:
                # raw NEGATIVE-stream state (target column excluded on its
                # owner shard); the composition adds the analytic target
                # term after the collective merge
                ce_ref[:] = m_scr[:]
                neg_ref[:] = s_scr[:]
                topk_ref[:] = topk_scr[:]
                return
            gt = gt_ref[:]
            logz_neg = m_scr[:] + jnp.log(s_scr[:])
            zt = scale * _phi_target(gt, loss_type, margin, mask_svfc)
            m_f = jnp.maximum(logz_neg, zt)
            logz_pos = m_f + jnp.log(jnp.exp(logz_neg - m_f) + jnp.exp(zt - m_f))
            logz = jnp.where(pos, logz_pos, logz_neg)
            ce_ref[:] = jnp.where(pos, logz - zt, 0.0)
            neg_ref[:] = jnp.where(
                pos, 0.0,
                jnp.mean(jnp.maximum(topk_scr[:], 0.0), axis=-1, keepdims=True))
            logz_ref[:] = logz
            topk_ref[:] = topk_scr[:]

        fin(scr1, gt1_ref, out1)
        fin(scr2, gt2_ref, out2)


def _written_cos_pair(emb, w0_raw, s_lane, col, cols_v, g_ref, v_ref,
                      rows_ref, cols_ref, blend_ref, t, tile, mxu_bf16, e8):
    """(cos1, cos2) for a tile holding at least one of this step's written
    slots — the per-view effective-view dots shared by the forward
    bodies (int8 storage: cos-level overrides through lane one-hots)."""
    if s_lane is not None:
        return _int8_written_cos(
            emb, w0_raw, s_lane, g_ref[:], v_ref[:],
            _lane_write_onehots(rows_ref[:], cols_ref[:], blend_ref[:],
                                t, tile), e8=e8)
    w0e, wbe = effective_tile_views(
        w0_raw.astype(jnp.float32), col[0], g_ref[:].astype(jnp.float32),
        rows_ref[:][:, 0], cols_v, v_ref[:].astype(jnp.float32),
        blend_ref[:][:, 0], mxu_bf16=mxu_bf16)
    e_op, w0_op = _mxu_pair(emb, w0e, mxu_bf16)
    _, wb_op = _mxu_pair(emb, wbe, mxu_bf16)
    cos1 = jnp.dot(e_op, w0_op.T, preferred_element_type=jnp.float32)
    cos2 = jnp.dot(e_op, wb_op.T, preferred_element_type=jnp.float32)
    return cos1, cos2


def _quad_dir_fwd_shared_zfix(b, c, tile, k, loss_type, margin, scale,
                              mask_svfc, mxu_bf16, t, n_t, col, valid, w0_raw,
                              s_lane,
                              lab_ref, gt1_ref, gt2_ref, rows_ref, cols_ref,
                              blend_ref, emb_ref, g_ref, v_ref,
                              scr1, scr2, out1, out2, partial_out=False,
                              e8=None):
    """Arc/AM shared-stream forward at the FIXED z-reference (see
    _FIXED_REF_MAX_SCALE): the per-tile clean stream is one masked
    fold (the scale multiply rides the dot operands — _cos_tile zscale),
    one exp, and two reduces over the SAME [B, T] array; no running max,
    no rescale, no second cosine materialization. m_scr is never touched
    after init — the finalize (and the partial_out merge contract,
    parallel/_shard_common.collective_merge, which is reference-
    invariant) uses the constant reference ``scale``.

    (The ONE-PASS mode that once rode this body — accumulating softmax-
    weighted queue sums + per-subtile z-maxima so the backward never
    re-streamed the queue — was measured SLOWER at step level on both
    int8 and f32 queues and removed; docs/PERF.md "Step-level A/B
    result". Two lessons stay: the S-dot epilogue serializes the MXU
    stream, and an id-carrying top-k merge was measured 3-4x WORSE than
    value-only merges (round-3 session-5 bisect) — never reintroduce
    per-merge index extraction.)"""
    labels = lab_ref[:]
    emb = emb_ref[:].astype(jnp.float32)
    cols_v = cols_ref[:][:, 0]
    is_target = col == labels
    neg_ok = valid & jnp.logical_not(is_target)

    def stream(zm, e, zx_row, scrs):
        """Fold one masked z-tile into each (m, s, topk) scr: the sum at
        the fixed reference (``e`` = exp(zm − scale) and ``zx_row`` =
        max(zm) [B] come from the caller so the one-pass S dots and z-max
        record reuse them); z-unit top-k."""
        ts = jnp.sum(e, axis=-1, keepdims=True)
        for scr in scrs:
            scr[1][:] = scr[1][:] + ts
        if "topk" in _ABLATE:  # perf-bisect only: cost of needs+merge
            return
        kth = jnp.min(scrs[0][2][:], axis=-1, keepdims=True)
        if len(scrs) == 2:
            kth = jnp.minimum(
                kth, jnp.min(scrs[1][2][:], axis=-1, keepdims=True))
        needs = jnp.any(zx_row[:, None] > kth)

        @pl.when(needs)
        def _merge():
            # both views share zm: extract the tile's candidates ONCE
            # (two-stage probe, _merge_tile_topk), fold into each buffer
            # (k passes over [b, k+m] — negligible). Exact:
            # topk(buf ∪ zm) == topk(buf ∪ topk_k(zm))
            _merge_tile_topk(zm, kth, [scr[2] for scr in scrs], k)

    tile_hit = jnp.any((cols_v >= t * tile) & (cols_v < t * tile + tile))

    @pl.when(tile_hit)
    def _written_tile():
        cos1, cos2 = _written_cos_pair(emb, w0_raw, s_lane, col, cols_v,
                                       g_ref, v_ref, rows_ref, cols_ref,
                                       blend_ref, t, tile, mxu_bf16, e8)
        zm1 = jnp.where(neg_ok, scale * cos1, NEG_INF)
        zm2 = jnp.where(neg_ok, scale * cos2, NEG_INF)
        e1 = jnp.exp(zm1 - scale)
        e2 = jnp.exp(zm2 - scale)
        zx1 = jnp.max(zm1, axis=-1)
        zx2 = jnp.max(zm2, axis=-1)
        stream(zm1, e1, zx1, [scr1])
        stream(zm2, e2, zx2, [scr2])

    @pl.when(jnp.logical_not(tile_hit))
    def _clean_tile():
        z = _cos_tile(emb, w0_raw, s_lane, mxu_bf16, e8=e8, zscale=scale)
        zm = z if "mask" in _ABLATE else jnp.where(neg_ok, z, NEG_INF)
        e = (zm - scale) if "exp" in _ABLATE else jnp.exp(zm - scale)
        zx = jnp.max(zm, axis=-1)
        stream(zm, e, zx, [scr1, scr2])

    @pl.when(t == n_t - 1)
    def _finalize():
        pos = labels >= 0
        inv_s = 1.0 / scale

        def fin(scr, gt_ref, out):
            s_scr, topk_scr = scr[1], scr[2]
            ce_ref, neg_ref, logz_ref, topk_ref = out
            topk_cos = topk_scr[:] * inv_s  # exact for power-of-two scales
            if partial_out:
                # (m, s) partial at the constant reference — the
                # collective merge rescales by exp(m_i − pmax m) so any
                # per-shard reference (fixed here, running max on the CPU
                # scan shards) composes exactly
                ce_ref[:] = jnp.full((b, 1), scale, jnp.float32)
                neg_ref[:] = s_scr[:]
                topk_ref[:] = topk_cos
                return
            gt = gt_ref[:]
            logz_neg = scale + jnp.log(s_scr[:])
            zt = scale * _phi_target(gt, loss_type, margin, mask_svfc)
            m_f = jnp.maximum(logz_neg, zt)
            logz_pos = m_f + jnp.log(jnp.exp(logz_neg - m_f) + jnp.exp(zt - m_f))
            logz = jnp.where(pos, logz_pos, logz_neg)
            ce_ref[:] = jnp.where(pos, logz - zt, 0.0)
            neg_ref[:] = jnp.where(
                pos, 0.0,
                jnp.mean(jnp.maximum(topk_cos, 0.0), axis=-1, keepdims=True))
            logz_ref[:] = logz
            topk_ref[:] = topk_cos

        fin(scr1, gt1_ref, out1)
        fin(scr2, gt2_ref, out2)


def _quad_dir_bwd_shared(b, d, c, tile, kw, mxu_bf16, t, col, valid, w0_raw,
                         s_lane,
                         lab_ref, rows_ref, cols_ref, blend_ref,
                         gt1_ref, gt2_ref, logz1_ref, logz2_ref, kth1_ref,
                         kth2_ref, dce1_ref, dneg1_ref, dce2_ref, dneg2_ref,
                         emb_ref, g_ref, v_ref, demb_scr, dgt1_scr, dgt2_scr,
                         n_t, e8=None):
    loss_type = kw["loss_type"]
    margin = kw["margin"]
    scale = kw["scale"]
    k = kw["k"]
    mask_svfc = kw["mask_svfc"]
    labels = lab_ref[:]
    pos = labels >= 0
    emb = emb_ref[:].astype(jnp.float32)
    cols_v = cols_ref[:][:, 0]
    is_target = col == labels
    neg_ok = valid & jnp.logical_not(is_target)
    logz1 = logz1_ref[:]
    logz2 = logz2_ref[:]
    # combined stable reference: z ≤ logz_v for every negative column, so
    # exp(z − ref) ≤ 1 with ref = min(logz1, logz2)
    ref = jnp.minimum(logz1, logz2)
    c12 = (dce1_ref[:] * jnp.exp(ref - logz1)
           + dce2_ref[:] * jnp.exp(ref - logz2)) * scale
    # z-unit hard-negative membership: one [B, 1] threshold per view folds
    # the (cos ≥ kth − TOL) & (cos > 0) pair into a single compare (the
    # & !pos guard is free — d_neg is pre-masked to 0 on positive rows at
    # the call sites); masked columns sit at NEG_INF and never pass
    zthr1 = jnp.maximum(scale * (kth1_ref[:] - KTH_TIE_TOL), _Z_POS_TINY)
    zthr2 = jnp.maximum(scale * (kth2_ref[:] - KTH_TIE_TOL), _Z_POS_TINY)
    dn1 = dneg1_ref[:] * (1.0 / k)
    dn2 = dneg2_ref[:] * (1.0 / k)

    def dc_combined(zm):
        dc = jnp.exp(zm - ref) * c12
        dc = dc + jnp.where(zm >= zthr1, dn1, 0.0)
        dc = dc + jnp.where(zm >= zthr2, dn2, 0.0)
        return dc

    def dc_one(cos, logz, dce, dneg, kth):
        z = jnp.where(neg_ok, scale * cos, NEG_INF)
        dc = jnp.exp(z - logz) * dce * scale
        cosm = jnp.where(valid, cos, NEG_INF)
        intk = (cosm >= kth - KTH_TIE_TOL) & (cosm > 0) & jnp.logical_not(pos)
        dc = dc + jnp.where(intk, dneg / k, 0.0)
        return jnp.where(valid, dc, 0.0)

    tile_hit = jnp.any((cols_v >= t * tile) & (cols_v < t * tile + tile))

    @pl.when(tile_hit)
    def _written_tile():
        if s_lane is not None:
            oh = _lane_write_onehots(rows_ref[:], cols_ref[:], blend_ref[:],
                                     t, tile)
            cos1, cos2 = _int8_written_cos(emb, w0_raw, s_lane, g_ref[:],
                                           v_ref[:], oh, e8=e8)
            dc1 = dc_one(cos1, logz1, dce1_ref[:], dneg1_ref[:], kth1_ref[:])
            dc2 = dc_one(cos2, logz2, dce2_ref[:], dneg2_ref[:], kth2_ref[:])
            demb_scr[:] = demb_scr[:] + _int8_written_demb(
                dc1, dc2, w0_raw, s_lane, g_ref[:], v_ref[:], oh)
            return
        w0e, wbe = effective_tile_views(
            w0_raw.astype(jnp.float32), col[0],
            g_ref[:].astype(jnp.float32), rows_ref[:][:, 0], cols_v,
            v_ref[:].astype(jnp.float32), blend_ref[:][:, 0],
            mxu_bf16=mxu_bf16)
        e_op, w0_op = _mxu_pair(emb, w0e, mxu_bf16)
        _, wb_op = _mxu_pair(emb, wbe, mxu_bf16)
        cos1 = jnp.dot(e_op, w0_op.T, preferred_element_type=jnp.float32)
        cos2 = jnp.dot(e_op, wb_op.T, preferred_element_type=jnp.float32)
        dc1 = dc_one(cos1, logz1, dce1_ref[:], dneg1_ref[:], kth1_ref[:])
        dc2 = dc_one(cos2, logz2, dce2_ref[:], dneg2_ref[:], kth2_ref[:])
        dc1_op, _ = _mxu_pair(dc1, dc1, mxu_bf16)
        dc2_op, _ = _mxu_pair(dc2, dc2, mxu_bf16)
        demb_scr[:] = demb_scr[:] \
            + jnp.dot(dc1_op, w0_op, preferred_element_type=jnp.float32) \
            + jnp.dot(dc2_op, wb_op, preferred_element_type=jnp.float32)

    @pl.when(jnp.logical_not(tile_hit))
    def _clean_tile():
        z = _cos_tile(emb, w0_raw, s_lane, mxu_bf16, e8=e8, zscale=scale)
        dc = dc_combined(jnp.where(neg_ok, z, NEG_INF))
        demb_scr[:] = demb_scr[:] + _demb_clean(dc, w0_raw, s_lane, mxu_bf16)

    @pl.when(t == n_t - 1)
    def _finalize_dgt():
        # analytic target-column gradient: dz_t = (p_t − 1)·d_ce·scale with
        # p_t = exp(scale·φ(gt_v) − logz_v); no per-tile accumulation needed
        def dgt(gt_ref, logz, dce_ref, scr):
            zt = scale * _phi_target(gt_ref[:], loss_type, margin, mask_svfc)
            p_t = jnp.exp(zt - logz)
            scr[:] = jnp.where(pos, (p_t - 1.0) * dce_ref[:] * scale, 0.0)

        dgt(gt1_ref, logz1, dce1_ref, dgt1_scr)
        dgt(gt2_ref, logz2, dce2_ref, dgt2_scr)
