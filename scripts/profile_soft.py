"""Piecewise on-chip timing of the soft 4K fwd+bwd path (round-2 perf work).

Each piece runs K iterations inside one jitted program (tunnel dispatch is
~30 ms; see NOTES.md) with inputs varied per iteration and a scalar readback.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from chaq_sdfgen_tpu.ops import softsdf, pallas_soft, threshold
from chaq_sdfgen_tpu.ops.edt import big_sentinel

N = 4096
spread = 64
band = spread + 2
T = 1.0
tau = 2.0
K = 8
rng = np.random.default_rng(0)
gray = jnp.asarray((rng.random((N, N)) * 255).astype(np.float32))
big = big_sentinel(band)


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
    print(f"{name:40s} {per:8.3f} ms/iter")
    return per


def loop(body):
    def outer(g):
        def it(i, acc):
            return acc + body(g + i.astype(jnp.float32))
        return jax.lax.fori_loop(0, K, it, jnp.float32(0))
    return outer


# --- fwd pieces ---
def heights_t(g):
    logits_t = threshold.soft_logits(g.T, tau=tau)
    h_in_t = threshold.soft_log_indicator_from_logits(logits_t, T, True, big)
    h_out_t = threshold.soft_log_indicator_from_logits(logits_t, T, False, big)
    return h_in_t, h_out_t


timeit("fwd: heights (transpose+elementwise)", loop(lambda g: jnp.sum(heights_t(g)[0]) + jnp.sum(heights_t(g)[1])), gray)

h_in_t, h_out_t = jax.jit(heights_t)(gray)
h_in_t = jax.block_until_ready(h_in_t)


def pass1_pair(ht):
    hp = jnp.pad(ht, ((band, band), (0, 0)), constant_values=jnp.float32(softsdf._PAD_HEIGHT))
    return pallas_soft.softmin_col_fwd(hp, band, T, interpret=False)


timeit("fwd: pass1 kernel x2", loop(lambda g: jnp.sum(pass1_pair(h_in_t + 0 * g[0, 0])) + jnp.sum(pass1_pair(h_out_t + 0 * g[0, 0]))), gray)

s1_in_t = jax.block_until_ready(jax.jit(pass1_pair)(h_in_t))


def transposes(g):
    a = s1_in_t + 0 * g[0, 0]
    s1 = jnp.concatenate([a.T, a.T + 1.0], axis=1)
    return jnp.sum(s1)


timeit("fwd: 2x transpose + concat", loop(transposes), gray)

s1cat = jnp.concatenate([s1_in_t.T, s1_in_t.T], axis=1)
s1cat = jax.block_until_ready(s1cat)


def pass2(g):
    s1p = jnp.pad(s1cat + 0 * g[0, 0], ((band, band), (0, 0)), constant_values=jnp.float32(softsdf._PAD_HEIGHT))
    return jnp.sum(pallas_soft.softmin_col_fwd(s1p, band, T, interpret=False))


timeit("fwd: pass2 kernel (2W wide)", loop(pass2), gray)

timeit("fwd: full soft_sdf_field", loop(lambda g: jnp.sum(softsdf.soft_sdf_field(g, spread, tau=tau, temperature=T))), gray)

# --- bwd pieces ---
gext1 = jnp.pad(h_in_t, ((band, band), (0, 0)), constant_values=jnp.float32(softsdf._PAD_HEIGHT))
gext1 = jax.block_until_ready(gext1)
s1v = jax.block_until_ready(jax.jit(lambda: pallas_soft.softmin_col_fwd(gext1, band, T, interpret=False))())
ctv = jnp.ones_like(s1v)


def bwd1(g):
    return jnp.sum(pallas_soft.softmin_col_bwd(gext1 + 0 * g[0, 0], s1v, ctv, band, T, interpret=False))


timeit("bwd: pass1-size bwd kernel (x1)", loop(bwd1), gray)

gext2 = jnp.pad(s1cat, ((band, band), (0, 0)), constant_values=jnp.float32(softsdf._PAD_HEIGHT))
gext2 = jax.block_until_ready(gext2)
s2v = jax.block_until_ready(jax.jit(lambda: pallas_soft.softmin_col_fwd(gext2, band, T, interpret=False))())
ct2 = jnp.ones_like(s2v)


def bwd2(g):
    return jnp.sum(pallas_soft.softmin_col_bwd(gext2 + 0 * g[0, 0], s2v, ct2, band, T, interpret=False))


timeit("bwd: pass2-size bwd kernel (2W)", loop(bwd2), gray)


def full(g):
    v, gr = jax.value_and_grad(lambda x: jnp.sum(softsdf.soft_sdf_field(x, spread, tau=tau, temperature=T)))(g)
    return v + jnp.sum(gr)


timeit("full fwd+bwd", loop(full), gray)

import os
os._exit(0)
