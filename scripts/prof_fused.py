"""Per-kernel on-chip timing of the fused soft pipeline (F1/F2/B2/B1)."""
import sys
import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from chaq_sdfgen_tpu.ops import pallas_soft_fused as F

N = 4096
spread = 64
band = spread + 2
T = 1.0
tau = 2.0
eps = 1e-6
K = 8
rng = np.random.default_rng(0)

which = set(sys.argv[1:]) or {"f1", "f2", "b2", "b1", "e2e"}


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

# produce realistic intermediates once
s1cat, logitsT, s1t_cat = jax.jit(
    lambda g: F.f1_pass(g, F._params(tau, T, eps, 0.0, N), N, band, True, jnp.float32, False)
)(gray)
s1cat = jax.block_until_ready(s1cat)
ct = jnp.ones((N, N), jnp.float32)
d2cat = jax.jit(lambda s: F.f2_pass(s, F._params(tau, T, eps), N, band, False)[1])(s1cat)
d2cat = jax.block_until_ready(d2cat)
ds1t, ph = jax.jit(lambda s, c, d: F.b2_pass(s, c, d, F._params(tau, T, eps), band, False))(s1cat, ct, d2cat)
ds1t = jax.block_until_ready(ds1t)
ph = int(ph)
print("shapes:", s1cat.shape, logitsT.shape, ds1t.shape, "ph:", ph, flush=True)

if "f1" in which:
    timeit(
        "F1 (gray->S1cat+logitsT)",
        loop(lambda i, g: jnp.sum(F.f1_pass(g + i, F._params(tau, T, eps, 0.0, N), N, band, True, jnp.float32, False)[0].astype(jnp.float32))),
        gray,
    )
if "f2" in which:
    timeit(
        "F2 (S1cat->field)",
        loop(lambda i, s: jnp.sum(F.f2_pass(s + i.astype(s.dtype), F._params(tau, T, eps), N, band, False)[0])),
        s1cat,
    )
if "b2" in which:
    timeit(
        "B2 (S1cat,ct->dS1T)",
        loop(lambda i, s, c, d: jnp.sum(F.b2_pass(s, c + i, d, F._params(tau, T, eps), band, False)[0].astype(jnp.float32))),
        s1cat, ct, d2cat,
    )
if "b1" in which:
    timeit(
        "B1 (logitsT,dS1T->dgray)",
        loop(lambda i, l, d, st: jnp.sum(F.b1_pass(l, d + i.astype(d.dtype), st, F._params(tau, T, eps, 0.0, N), N, band, ph, True, False))),
        logitsT, ds1t, s1t_cat,
    )

if "e2e" in which:
    # SGD-on-pixels loop (the soft path's real training pattern): the
    # gradient is consumed by the update, which also varies the input so
    # nothing folds across iterations
    def e2e(g0):
        def body(i, carry):
            g, acc = carry
            v, gr = jax.value_and_grad(
                lambda x: jnp.sum(
                    F.soft_sdf_field_fused(x, band, tau, T, eps, True, False)
                )
            )(g)
            return (g - jnp.float32(1e-6) * gr, acc + v)

        _, acc = jax.lax.fori_loop(0, K, body, (g0, jnp.float32(0)))
        return acc

    timeit("fused e2e fwd+bwd (SGD loop)", e2e, gray)

if "fwdonly" in which:
    timeit(
        "fused fwd only (F1+F2)",
        loop(lambda i, g: jnp.sum(
            F.soft_sdf_field_fused(g + i, band, tau, T, eps, True, False)
        )),
        gray,
    )

import os
os._exit(0)
