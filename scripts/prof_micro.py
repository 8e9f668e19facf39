"""Micro-benchmarks for round-2 kernel design decisions (on-chip).

1. In-kernel VMEM transpose viability + cost (vs plain copy).
2. exp vs exp2 vs bf16-exp throughput in a band-stencil-shaped loop.
"""
import sys
import time
import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N = 4096
K = 8
rng = np.random.default_rng(0)
x = jnp.asarray(rng.random((N, N)).astype(np.float32))


def timeit(name, fn, *args):
    f = jax.jit(fn)
    try:
        r = f(*args)
        jax.block_until_ready(r)
    except Exception as e:
        print(f"{name:44s} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)
        return None
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(*args))
        best = min(best, time.perf_counter() - t0)
    per = best / K * 1e3
    print(f"{name:44s} {per:8.3f} ms/iter", flush=True)
    return per


def loop(body):
    def outer(*args):
        def it(i, acc):
            return acc + body(i.astype(jnp.float32), *args)
        return jax.lax.fori_loop(0, K, it, jnp.float32(0))
    return outer


which = set(sys.argv[1:]) or {"copy", "tr", "exp"}

# --- 1. copy baseline: (TM, N) blocks in -> out ---
def _copy_kernel(x_ref, o_ref):
    o_ref[:, :] = x_ref[:, :]


def copy_pallas(xx):
    return pl.pallas_call(
        _copy_kernel,
        grid=(N // 128,),
        in_specs=[pl.BlockSpec((128, N), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((128, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(xx)


if "copy" in which:
    timeit("pallas copy (128,N) blocks", loop(lambda i, a: jnp.sum(copy_pallas(a + i))), x)

# --- 2. in-kernel transpose: read (128, N) block, write (N, 128) strip ---
def _tr_kernel(x_ref, o_ref):
    o_ref[:, :] = x_ref[:, :].T


def tr_pallas(xx):
    return pl.pallas_call(
        _tr_kernel,
        grid=(N // 128,),
        in_specs=[pl.BlockSpec((128, N), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((N, 128), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(xx)


# chunked transpose: 128x128 tiles via static slices
def _tr_chunk_kernel(x_ref, o_ref):
    for c in range(0, N, 512):
        o_ref[c : c + 512, :] = x_ref[:, c : c + 512].T


def tr_chunk_pallas(xx):
    return pl.pallas_call(
        _tr_chunk_kernel,
        grid=(N // 128,),
        in_specs=[pl.BlockSpec((128, N), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((N, 128), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(xx)


if "tr" in which:
    timeit("XLA transpose", loop(lambda i, a: jnp.sum((a + i).T, axis=None)), x)
    r = timeit("pallas in-kernel transpose whole", loop(lambda i, a: jnp.sum(tr_pallas(a + i))), x)
    if r is not None:
        got = np.asarray(tr_pallas(x))
        ok = np.array_equal(got, np.asarray(x).T)
        print(f"   transpose correct: {ok}", flush=True)
    r2 = timeit("pallas in-kernel transpose 512-chunks", loop(lambda i, a: jnp.sum(tr_chunk_pallas(a + i))), x)
    if r2 is not None:
        got = np.asarray(tr_chunk_pallas(x))
        print(f"   chunked transpose correct: {np.array_equal(got, np.asarray(x).T)}", flush=True)

# --- 3. exp throughput: 32 taps over a (4096+64, 128) strip ---
def _exp_kernel(x_ref, o_ref, *, mode):
    h = 4096
    for r in range(0, h, 256):
        acc = jnp.zeros((256, 128), jnp.float32)
        m = x_ref[r : r + 256, :]
        if mode == "bf16":
            acc = acc.astype(jnp.bfloat16)
            m = m.astype(jnp.bfloat16)
        for k in range(32):
            blk = x_ref[r + k : r + k + 256, :]
            if mode == "bf16":
                blk = blk.astype(jnp.bfloat16)
            z = m - blk - jnp.asarray(k * 0.25, blk.dtype)
            if mode == "exp":
                acc = acc + jnp.exp(z)
            elif mode == "exp2":
                acc = acc + jnp.exp2(z)
            elif mode == "bf16":
                acc = acc + jnp.exp2(z)
            else:
                acc = acc + z
        o_ref[r : r + 256, :] = acc.astype(jnp.float32)


def exp_pallas(xx, mode):
    kern = functools.partial(_exp_kernel, mode=mode)
    return pl.pallas_call(
        kern,
        grid=(N // 128,),
        in_specs=[pl.BlockSpec((N + 64, 128), lambda i: (0, i), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((N, 128), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(xx)


if "exp" in which:
    xp = jnp.pad(x, ((0, 64), (0, 0)))
    xp = jax.block_until_ready(xp)
    for mode in ("add", "exp", "exp2", "bf16"):
        timeit(f"32-tap stencil [{mode}]", loop(lambda i, a, m=mode: jnp.sum(exp_pallas(a + i, m))), xp)

import os
os._exit(0)
