"""On-chip piecewise timing of the soft path (round-2 perf work).

K iterations inside one jitted program, inputs passed as ARGUMENTS (closure
capture bakes arrays into the program and overflows the remote-compile
tunnel), varied per iteration, scalar readback.
"""
import sys
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

which = set(sys.argv[1:]) or {"pass1", "fwd", "fwdbwd", "bwd1"}


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
    print(f"{name:40s} {per:8.3f} ms/iter", flush=True)
    return per


def loop(body):
    def outer(*args):
        def it(i, acc):
            return acc + body(i.astype(jnp.float32), *args)
        return jax.lax.fori_loop(0, K, it, jnp.float32(0))
    return outer


gray = jnp.asarray((rng.random((N, N)) * 255).astype(np.float32))
big = big_sentinel(band)

# realistic-ish heights for one field, from noise gray
logits_t = jax.jit(lambda g: threshold.soft_logits(g.T, tau=tau))(gray)
h_in_t = jax.jit(
    lambda l: threshold.soft_log_indicator_from_logits(l, T, True, big)
)(logits_t)
gext1 = jnp.pad(h_in_t, ((band, band), (0, 0)), constant_values=jnp.float32(softsdf._PAD_HEIGHT))
gext1 = jax.block_until_ready(gext1)

if "pass1" in which:
    timeit(
        "pass1 fwd kernel (1 field)",
        loop(lambda i, ge: jnp.sum(pallas_soft.softmin_col_fwd(ge + i, band, T, interpret=False))),
        gext1,
    )

if "fwd" in which:
    timeit(
        "full soft_sdf_field fwd",
        loop(lambda i, g: jnp.sum(softsdf.soft_sdf_field(g + i, spread, tau=tau, temperature=T))),
        gray,
    )

if "fwdbwd" in which:
    def full(i, g):
        v, gr = jax.value_and_grad(
            lambda x: jnp.sum(softsdf.soft_sdf_field(x, spread, tau=tau, temperature=T))
        )(g + i)
        return v + jnp.sum(gr)

    timeit("full fwd+bwd", loop(full), gray)

if "bwd1" in which:
    s1v = jax.block_until_ready(
        jax.jit(lambda ge: pallas_soft.softmin_col_fwd(ge, band, T, interpret=False))(gext1)
    )
    ctv = jnp.ones_like(s1v)
    timeit(
        "pass1-size bwd kernel (1 field)",
        loop(
            lambda i, ge, s, c: jnp.sum(
                pallas_soft.softmin_col_bwd(ge + i, s, c, band, T, interpret=False)
            )
        ),
        gext1, s1v, ctv,
    )

import os
os._exit(0)
