"""Bisect the streaming fwd kernel cost at C=1M: full vs no-stats vs no-topk
vs minimal (matmul + online LSE only)."""
import time, functools
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", "/root/.vlsfr_jax_cache")
from vlsfr_tpu.ops.margin_pallas import pallas_margin_ce_fwd, compute_gt, NEG_INF, _pad_classes

B, C, D, T = 128, 1_048_576, 512, 512
rng = np.random.default_rng(0)
emb = jax.device_put(jnp.asarray(rng.standard_normal((B, D)), jnp.float32))
emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
w = jax.device_put(jax.random.normal(jax.random.PRNGKey(0), (C, D), jnp.float32) * 0.01)
labels = jax.device_put(jnp.asarray(rng.integers(0, C, B), jnp.int32))
gt = jax.jit(lambda e, ww, l: compute_gt(e, ww, l, True))(emb, w, labels)

def timed(name, fn, *args, n=20):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n): out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t0)/n*1000:.2f} ms")

kw = dict(loss_type="Arc", margin=0.5, scale=32.0, k=1, mask_svfc=1.2,
          normalize_w=True, tile=T)
timed("full fwd (stats)", jax.jit(lambda e,ww,l,g: pallas_margin_ce_fwd(e,ww,l,g, with_stats=True, **kw)), emb, w, labels, gt)
timed("full fwd (no stats)", jax.jit(lambda e,ww,l,g: pallas_margin_ce_fwd(e,ww,l,g, with_stats=False, **kw)), emb, w, labels, gt)

# minimal: matmul + normalize + online logsumexp only
def make_min_kernel(b, d, c, tile, normalize):
    def kernel(emb_ref, w_ref, logz_ref, m_scr, s_scr):
        t = pl.program_id(0); n_t = pl.num_programs(0)
        @pl.when(t == 0)
        def _init():
            m_scr[:] = jnp.full((b,1), NEG_INF, jnp.float32)
            s_scr[:] = jnp.zeros((b,1), jnp.float32)
        wt = w_ref[:].astype(jnp.float32)
        if normalize:
            n2 = jnp.maximum(jnp.sum(wt*wt, -1, keepdims=True), 1e-24)
            wt = wt * jax.lax.rsqrt(n2)
        z = 32.0 * jnp.dot(emb_ref[:], wt.T, preferred_element_type=jnp.float32)
        m_old = m_scr[:]
        m_new = jnp.maximum(m_old, jnp.max(z, -1, keepdims=True))
        s_scr[:] = s_scr[:]*jnp.exp(m_old-m_new) + jnp.sum(jnp.exp(z-m_new), -1, keepdims=True)
        m_scr[:] = m_new
        @pl.when(t == n_t-1)
        def _fin():
            logz_ref[:] = m_scr[:] + jnp.log(s_scr[:])
    return kernel

def minimal(normalize):
    wp, n_tiles = _pad_classes(w, C, T)
    return pl.pallas_call(
        make_min_kernel(B, D, C, T, normalize),
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((B, D), lambda t: (0,0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((T, D), lambda t: (t,0), memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((B,1), lambda t: (0,0), memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((B,1), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((B,1), jnp.float32), pltpu.VMEM((B,1), jnp.float32)],
    )(emb, wp)

timed("minimal LSE (normalize)", jax.jit(lambda: minimal(True)))
timed("minimal LSE (no normalize)", jax.jit(lambda: minimal(False)))
