"""Window-einsum block width sweep: contraction = BLK + 2K pads to a
multiple of 128 on the MXU, so BLK=64 with K<=22 needs ONE 128-deep
pass where BLK=128 needs two. Does the saved pass beat the extra
window-build overhead of 2x as many blocks?
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from chaq_sdfgen_tpu.ops import soft_mxu as M

_K1, _K2 = 4, 36


def slope_ms(make_loop, *args, reps=3):
    f1 = jax.jit(make_loop(_K1))
    f2 = jax.jit(make_loop(_K2))
    float(f1(*args))
    float(f2(*args))

    def once(f):
        t0 = time.perf_counter()
        float(f(*args))
        return time.perf_counter() - t0

    t1 = min(once(f1) for _ in range(reps))
    t2 = min(once(f2) for _ in range(reps))
    return max(t2 - t1, 1e-9) / (_K2 - _K1) * 1e3


def band_matrix(k, temperature, blk):
    j = jnp.arange(blk + 2 * k, dtype=jnp.float32)[:, None]
    q = jnp.arange(blk, dtype=jnp.float32)[None, :]
    d = j - q - jnp.float32(k)
    w = jnp.exp(-(d * d) / jnp.float32(temperature))
    return jnp.where(jnp.abs(d) <= k, w, jnp.float32(0.0))


def conv_rows_blk(e, wmat, k, blk):
    hgt, wid = e.shape
    nb = wid // blk
    eb = e.reshape(hgt, nb, blk)
    left = jnp.pad(eb[:, :-1, blk - k :], ((0, 0), (1, 0), (0, 0)))
    right = jnp.pad(eb[:, 1:, :k], ((0, 0), (0, 1), (0, 0)))
    win = jnp.concatenate([left, eb, right], axis=2)
    s = jnp.einsum("hbj,jq->hbq", win, wmat, precision=M._PRECISION)
    return s.reshape(hgt, wid)


def conv_cols_blk(e, wmat, k, blk):
    hgt, wid = e.shape
    nb = hgt // blk
    eb = e.reshape(nb, blk, wid)
    up = jnp.pad(eb[:-1, blk - k :, :], ((1, 0), (0, 0), (0, 0)))
    dn = jnp.pad(eb[1:, :k, :], ((0, 1), (0, 0), (0, 0)))
    win = jnp.concatenate([up, eb, dn], axis=1)
    s = jnp.einsum("bjw,jq->bqw", win, wmat, precision=M._PRECISION)
    return s.reshape(hgt, wid)


N = 4096
T = 1.0
rng = np.random.default_rng(0)
e4k = jnp.asarray(rng.random((N, N)).astype(np.float32))


def vary(g, i):
    return g + jnp.float32(1e-12) * i


def mk(fn, k, blk):
    w = band_matrix(k, T, blk)

    def outer(kk):
        def loop(e0):
            def body(i, acc):
                return acc + jnp.sum(fn(vary(e0, i), w, k, blk))
            return jax.lax.fori_loop(0, kk, body, jnp.float32(0))
        return loop
    return outer


# sanity: values match across widths
w64 = band_matrix(10, T, 64)
w128 = band_matrix(10, T, 128)
a = conv_rows_blk(e4k[:256], w64, 10, 64)
b = conv_rows_blk(e4k[:256], w128, 10, 128)
print("rows 64-vs-128 maxdiff:", float(jnp.max(jnp.abs(a - b))), file=sys.stderr)

for k in (10, 22):
    for blk in (64, 128, 256):
        tr = slope_ms(mk(conv_rows_blk, k, blk), e4k)
        tc = slope_ms(mk(conv_cols_blk, k, blk), e4k)
        print(
            f"K={k:3d} BLK={blk:3d}  rows {tr:6.3f}  cols {tc:6.3f}  (ms, 4K fwd)",
            file=sys.stderr,
        )
