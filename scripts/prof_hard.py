"""On-chip component timing of the hard EXACT pipeline (pass 1 / pass 2 /
full), K in-graph iterations, scalar readback."""
import sys
import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from chaq_sdfgen_tpu.ops import pallas_edt

N = 4096
spread = 64
band = spread + 2
K = 8
rng = np.random.default_rng(0)

which = set(sys.argv[1:]) or {"p1", "p2", "full"}


def timeit(name, fn, *args):
    f = jax.jit(fn)
    r = f(*args)
    jax.block_until_ready(r)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(*args))
        best = min(best, time.perf_counter() - t0)
    per = best / K * 1e3
    print(f"{name:40s} {per:8.3f} ms/iter -> {N*N/per*1e3/1e9:.3f} Gpix/s", flush=True)
    return per


def loop(body):
    def outer(*args):
        def it(i, acc):
            return acc + body(i, *args)
        return jax.lax.fori_loop(0, K, it, jnp.int32(0))
    return outer


b4k = jnp.asarray(rng.random((N, N)) < 0.3)

if "p1" in which:
    timeit(
        "pass1 row_distances_u8",
        loop(lambda i, b: jnp.sum(
            pallas_edt.row_distances_u8(jnp.logical_xor(b, i % 2 == 1), band)[0]
            .astype(jnp.int32))),
        b4k,
    )

if "p2" in which:
    din, dout = jax.jit(lambda b: pallas_edt.row_distances_u8(b, band))(b4k)
    sat = jnp.uint8(255)
    din_e = jnp.pad(din, ((band, band), (0, 0)), constant_values=sat)
    dout_e = jnp.pad(dout, ((band, band), (0, 0)), constant_values=sat)
    din_e, dout_e = jax.block_until_ready((din_e, dout_e))
    timeit(
        "pass2 fused_pass2_bytes",
        loop(lambda i, a, o: jnp.sum(
            pallas_edt.fused_pass2_bytes(
                jnp.where(i % 2 == 1, a, a), o, spread, False, band
            ).astype(jnp.int32))),
        din_e, dout_e,
    )

if "full" in which:
    timeit(
        "full fused_sdf_bytes",
        loop(lambda i, b: jnp.sum(
            pallas_edt.fused_sdf_bytes(jnp.logical_xor(b, i % 2 == 1), spread)
            .astype(jnp.int32))),
        b4k,
    )

import os
os._exit(0)
