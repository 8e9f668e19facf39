"""Window-slab einsum vs block-Toeplitz 3-matmul banded conv, on chip.

The window form contracts (BLK+2K) per output (fewer FLOPs for small K)
but materializes a (hgt, nb, BLK+2K) slab; the 3-matmul form is three
lane-aligned (128,128) einsums (3*BLK MACs per output, no slab).
Crossover question: which wins at the real K (~10) and at large K (~36)?
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


N = 4096
T = 1.0
rng = np.random.default_rng(0)
e4k = jnp.asarray(rng.random((N, N)).astype(np.float32))


def vary(g, i):
    return g + jnp.float32(1e-12) * i


def mk_win_rows(k):
    w = M._band_matrix(k, T)

    def outer(kk):
        def loop(e0):
            def body(i, acc):
                return acc + jnp.sum(M._conv_rows(vary(e0, i), w, k))
            return jax.lax.fori_loop(0, kk, body, jnp.float32(0))
        return loop
    return outer


def mk_blk_rows(k):
    c = M._corner_matrices(k, T)

    def outer(kk):
        def loop(e0):
            def body(i, acc):
                return acc + jnp.sum(M._conv_rows3(vary(e0, i), c))
            return jax.lax.fori_loop(0, kk, body, jnp.float32(0))
        return loop
    return outer


def mk_win_cols(k):
    w = M._band_matrix(k, T)

    def outer(kk):
        def loop(e0):
            def body(i, acc):
                return acc + jnp.sum(M._conv_cols(vary(e0, i), w, k))
            return jax.lax.fori_loop(0, kk, body, jnp.float32(0))
        return loop
    return outer


def mk_blk_cols(k):
    c = M._corner_matrices(k, T)

    def outer(kk):
        def loop(e0):
            def body(i, acc):
                return acc + jnp.sum(M._conv_cols3(vary(e0, i), c))
            return jax.lax.fori_loop(0, kk, body, jnp.float32(0))
        return loop
    return outer


for k in (10, 36):
    tr_w = slope_ms(mk_win_rows(k), e4k)
    tr_b = slope_ms(mk_blk_rows(k), e4k)
    tc_w = slope_ms(mk_win_cols(k), e4k)
    tc_b = slope_ms(mk_blk_cols(k), e4k)
    print(
        f"K={k:3d}  rows: win {tr_w:6.3f}  blk3 {tr_b:6.3f}   "
        f"cols: win {tc_w:6.3f}  blk3 {tc_b:6.3f}  (ms, 4K fwd)",
        file=sys.stderr,
    )
