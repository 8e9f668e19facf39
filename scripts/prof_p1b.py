"""Isolate the pass-1 input-stage cost: convert vs transpose vs chunking."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N = 4096
K = 8
TM = 128
WP = N
rng = np.random.default_rng(0)
b4k = jnp.asarray((rng.random((N, N)) < 0.3).astype(np.uint8))


def timeit(name, fn, *args):
    f = jax.jit(fn)
    jax.block_until_ready(f(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:44s} {best / K * 1e3:8.3f} ms/iter", flush=True)


def loop(body):
    def outer(*args):
        return jax.lax.fori_loop(0, K, lambda i, acc: acc + body(i, *args), jnp.int32(0))
    return outer


def bench_kernel(name, kern, chunk=512):
    def call(b):
        return pl.pallas_call(
            kern,
            grid=(N // TM,),
            in_specs=[pl.BlockSpec((TM, WP), lambda i: (i, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((TM, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, 128), jnp.int32),
            scratch_shapes=[pltpu.VMEM((WP, 2 * TM), jnp.int32)],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        )(b)

    timeit(name, loop(lambda i, b: jnp.sum(
        call(jnp.logical_xor(b > 0, i % 2 == 1).astype(jnp.uint8))[:128])), b4k)


which = set(sys.argv[1:]) or {"a", "b", "c", "d", "e", "f"}

# A: no transpose — convert + where, natural orientation writes
def kern_a(b_ref, o_ref, dscr):
    for c in range(0, WP, 512):
        blk = b_ref[:, c : c + 512].astype(jnp.int32)  # (TM, 512)
        m1 = jnp.where(blk > 0, jnp.int32(0), jnp.int32(1 << 20))
        m2 = jnp.where(blk == 0, jnp.int32(0), jnp.int32(1 << 20))
        # write natural orientation into scratch (layout differs; cost probe only)
        dscr[c : c + 256, 0:TM] = m1[:, 0:256].reshape(256, TM)
        dscr[c : c + 256, TM : 2 * TM] = m2[:, 0:256].reshape(256, TM)
    o_ref[:, :] = dscr[0:TM, 0:128]

# B: transpose AFTER i32 convert (current production path)
def kern_b(b_ref, o_ref, dscr):
    for c in range(0, WP, 512):
        blk = b_ref[:, c : c + 512].astype(jnp.int32).T  # (512, TM)
        dscr[c : c + 512, 0:TM] = jnp.where(blk > 0, jnp.int32(0), jnp.int32(1 << 20))
        dscr[c : c + 512, TM : 2 * TM] = jnp.where(blk == 0, jnp.int32(0), jnp.int32(1 << 20))
    o_ref[:, :] = dscr[0:TM, 0:128]

# C: transpose the u8 block first, then convert
def kern_c(b_ref, o_ref, dscr):
    for c in range(0, WP, 512):
        blk = b_ref[:, c : c + 512].T.astype(jnp.int32)  # u8.T then widen
        dscr[c : c + 512, 0:TM] = jnp.where(blk > 0, jnp.int32(0), jnp.int32(1 << 20))
        dscr[c : c + 512, TM : 2 * TM] = jnp.where(blk == 0, jnp.int32(0), jnp.int32(1 << 20))
    o_ref[:, :] = dscr[0:TM, 0:128]

# D: 128-col chunks (square vreg tiles)
def kern_d(b_ref, o_ref, dscr):
    for c in range(0, WP, 128):
        blk = b_ref[:, c : c + 128].astype(jnp.int32).T
        dscr[c : c + 128, 0:TM] = jnp.where(blk > 0, jnp.int32(0), jnp.int32(1 << 20))
        dscr[c : c + 128, TM : 2 * TM] = jnp.where(blk == 0, jnp.int32(0), jnp.int32(1 << 20))
    o_ref[:, :] = dscr[0:TM, 0:128]

# E: full-block single transpose (TM, WP) -> (WP, TM)
def kern_e(b_ref, o_ref, dscr):
    blk = b_ref[:, :].astype(jnp.int32).T  # (WP, TM)
    dscr[:, 0:TM] = jnp.where(blk > 0, jnp.int32(0), jnp.int32(1 << 20))
    dscr[:, TM : 2 * TM] = jnp.where(blk == 0, jnp.int32(0), jnp.int32(1 << 20))
    o_ref[:, :] = dscr[0:TM, 0:128]

# F: transpose via f32 (widen u8->f32, .T, compare) — probes dtype effect
def kern_f(b_ref, o_ref, dscr):
    for c in range(0, WP, 512):
        blk = b_ref[:, c : c + 512].astype(jnp.float32).T
        dscr[c : c + 512, 0:TM] = jnp.where(blk > 0, jnp.int32(0), jnp.int32(1 << 20))
        dscr[c : c + 512, TM : 2 * TM] = jnp.where(blk == 0, jnp.int32(0), jnp.int32(1 << 20))
    o_ref[:, :] = dscr[0:TM, 0:128]

for key, kern, nm in [
    ("a", kern_a, "A convert only, no transpose"),
    ("b", kern_b, "B i32 convert then .T (production)"),
    ("c", kern_c, "C u8 .T then convert"),
    ("d", kern_d, "D 128-col chunk transposes"),
    ("e", kern_e, "E one full-block transpose"),
    ("f", kern_f, "F f32 convert then .T"),
]:
    if key in which:
        try:
            bench_kernel(nm, kern)
        except Exception as e:
            print(f"{nm}: FAILED {type(e).__name__}: {e}", flush=True)

import os
os._exit(0)
