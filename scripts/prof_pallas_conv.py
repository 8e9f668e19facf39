"""On-chip parity + slope timing: Pallas cols_conv vs the XLA window einsum."""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from chaq_sdfgen_tpu.ops import soft_mxu as M
from chaq_sdfgen_tpu.ops import pallas_band_conv as PC

_K1, _K2 = 4, 36
K = 10
T = 1.0
N = 4096


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


rng = np.random.default_rng(0)
e4k = jnp.asarray(rng.random((N, N)).astype(np.float32))

# parity on chip
want = np.asarray(M.conv_cols_sym(e4k[:512, :256], K, T))
got = np.asarray(PC.cols_conv(e4k[:512, :256], K, T))
print("chip parity maxdiff:", np.abs(got - want).max(), file=sys.stderr)


def vary(g, i):
    return g + jnp.float32(1e-12) * i


def mk_xla(kk):
    def loop(e0):
        def body(i, acc):
            return acc + jnp.sum(M.conv_cols_sym(vary(e0, i), K, T))
        return jax.lax.fori_loop(0, kk, body, jnp.float32(0))
    return loop


def mk_pallas(kk):
    def loop(e0):
        def body(i, acc):
            return acc + jnp.sum(PC.cols_conv(vary(e0, i), K, T)[:64])
        return jax.lax.fori_loop(0, kk, body, jnp.float32(0))
    return loop


tx = slope_ms(mk_xla, e4k)
tp = slope_ms(mk_pallas, e4k)
print(f"cols conv 4K fwd: xla-einsum {tx:6.3f} ms   pallas {tp:6.3f} ms", file=sys.stderr)
