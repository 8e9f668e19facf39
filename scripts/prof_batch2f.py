"""Two separate per-field conv cascades vs one field-batched cascade.

The mm path runs rows+cols convs once per field (4 einsums). Stacking
the fields on a leading axis makes it 2 einsums of 2x the rows; the
stack should fuse into the elementwise producers. Nonlinear tail
(log) so the backward cannot constant-fold (the conv is linear).
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


wmat = M._band_matrix(K, T)
blk = wmat.shape[1]
rng = np.random.default_rng(0)
g4k = jnp.asarray(rng.random((N, N)).astype(np.float32))


def conv_rows_b(e, wm, k):
    """Batched rows conv: e (..., hgt, wid)."""
    *lead, hgt, wid = e.shape
    b = wm.shape[1]
    nb = wid // b
    eb = e.reshape(*lead, hgt, nb, b)
    nd = eb.ndim
    pads = [(0, 0)] * nd
    pl_, pr_ = list(pads), list(pads)
    pl_[-2] = (1, 0)
    pr_[-2] = (0, 1)
    left = jnp.pad(eb[..., :-1, b - k :], pl_)
    right = jnp.pad(eb[..., 1:, :k], pr_)
    win = jnp.concatenate([left, eb, right], axis=-1)
    s = jnp.einsum("...hbj,jq->...hbq", win, wm, precision=M._PRECISION)
    return s.reshape(*lead, hgt, wid)


def mk_two(kk):
    def loop(g0):
        def body(i, carry):
            g, acc = carry
            def loss(gg):
                e_in = jax.nn.sigmoid(gg)
                e_out = 1.0 - e_in
                a = M._conv_rows(e_in, wmat, K)
                bq = M._conv_rows(e_out, wmat, K)
                return jnp.sum(jnp.log1p(a * a)) + jnp.sum(jnp.log1p(bq * bq))
            v, gr = jax.value_and_grad(loss)(g)
            return (g - jnp.float32(1e-6) * gr, acc + v)
        _, acc = jax.lax.fori_loop(0, kk, body, (g0, jnp.float32(0)))
        return acc
    return loop


def mk_batched(kk):
    def loop(g0):
        def body(i, carry):
            g, acc = carry
            def loss(gg):
                e_in = jax.nn.sigmoid(gg)
                es = jnp.stack([e_in, 1.0 - e_in])
                s = conv_rows_b(es, wmat, K)
                return jnp.sum(jnp.log1p(s * s))
            v, gr = jax.value_and_grad(loss)(g)
            return (g - jnp.float32(1e-6) * gr, acc + v)
        _, acc = jax.lax.fori_loop(0, kk, body, (g0, jnp.float32(0)))
        return acc
    return loop


# sanity
ei = jax.nn.sigmoid(g4k[:256])
d = jnp.max(jnp.abs(conv_rows_b(jnp.stack([ei, 1 - ei]), wmat, K)[0]
                    - M._conv_rows(ei, wmat, K)))
print("batched-vs-plain maxdiff:", float(d), file=sys.stderr)

t2 = slope_ms(mk_two, g4k)
tb = slope_ms(mk_batched, g4k)
print(f"two separate rows-convs fwd+bwd : {t2:6.3f} ms", file=sys.stderr)
print(f"field-batched rows-conv fwd+bwd: {tb:6.3f} ms", file=sys.stderr)
