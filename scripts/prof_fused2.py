"""Per-kernel on-chip timing of the fused soft pipeline (F1/F2/B2/B1),
slope-based (dispatch-free) — see scripts/_timing.py."""
import sys

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo/scripts")
from _timing import device_ms_per_iter

from chaq_sdfgen_tpu.ops import pallas_soft_fused as F

N = 4096
spread = 64
band = spread + 2
T = 1.0
tau = 2.0
eps = 1e-6
rng = np.random.default_rng(0)

which = set(sys.argv[1:]) or {"f1", "f2", "b2", "b1", "e2e"}


def show(name, body, *args):
    ms, t1, t2 = device_ms_per_iter(body, *args)
    print(f"{name:40s} {ms:8.3f} ms/iter  (raw {t1*1e3:.1f}/{t2*1e3:.1f})", flush=True)


gray = jnp.asarray((rng.random((N, N)) * 255).astype(np.float32))

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

fi = lambda i: i.astype(jnp.float32)

if "f1" in which:
    show("F1 (gray->S1cat+logitsT)",
         lambda i, g: jnp.sum(
             F.f1_pass(g + fi(i), F._params(tau, T, eps, 0.0, N), N, band, True, jnp.float32, False)[0][:64]
             .astype(jnp.float32)),
         gray)
if "f2" in which:
    show("F2 (S1cat->field)",
         lambda i, s: jnp.sum(
             F.f2_pass(s + fi(i).astype(s.dtype), F._params(tau, T, eps), N, band, False)[0][:64]),
         s1cat)
if "b2" in which:
    show("B2 (S1cat,ct->dS1T)",
         lambda i, s, c, d: jnp.sum(
             F.b2_pass(s, c + fi(i), d, F._params(tau, T, eps), band, False)[0][:64].astype(jnp.float32)),
         s1cat, ct, d2cat)
if "b1" in which:
    show("B1 (logitsT,dS1T->dgray)",
         lambda i, l, d, st: jnp.sum(
             F.b1_pass(l, d + fi(i).astype(d.dtype), st, F._params(tau, T, eps, 0.0, N), N, band, ph,
                       True, False)[:64]),
         logitsT, ds1t, s1t_cat)

if "e2e" in which:
    import time

    def make_e2e(k):
        def e2e(g0):
            def body(i, carry):
                g, acc = carry
                v, gr = jax.value_and_grad(
                    lambda x: jnp.sum(
                        F.soft_sdf_field_fused(x, band, tau, T, eps, True, False)
                    )
                )(g)
                return (g - jnp.float32(1e-6) * gr, acc + v)
            _, acc = jax.lax.fori_loop(0, k, body, (g0, jnp.float32(0)))
            return acc
        return e2e

    f1c, f2c = jax.jit(make_e2e(4)), jax.jit(make_e2e(36))
    float(f1c(gray)); float(f2c(gray))
    def once(f):
        t0 = time.perf_counter(); float(f(gray)); return time.perf_counter() - t0
    t1 = min(once(f1c) for _ in range(3)); t2 = min(once(f2c) for _ in range(3))
    ms = (t2 - t1) / 32 * 1e3
    print(f"{'fused e2e fwd+bwd (SGD loop)':40s} {ms:8.3f} ms/iter", flush=True)

import os
os._exit(0)
