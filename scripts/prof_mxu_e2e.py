"""Slope-timed breakdown of the collapsed-mm soft path at 4K.

Question: the same mm path costs 0.33 ns/pix batched at 1K but 0.52 ns/pix
at 4K — where do the extra ~3 ms go? Components measured independently so
the fwd/bwd split and the conv/elementwise split are visible.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from chaq_sdfgen_tpu.ops import soft_mxu, softsdf, threshold

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
band = 64
tau, T, eps = 2.0, 1.0, 1e-5
rng = np.random.default_rng(0)
gray = jnp.asarray((rng.random((N, N)) * 255).astype(np.float32))

stats = soft_mxu._range_stats(band, tau, T, (0.0, 255.0))
k, shift = stats
stats2 = soft_mxu._range_stats(band, tau, T, (0.0, 255.0), margin=6.0)
k2, _ = stats2
print(f"K={k} K2={k2} shift={shift:.2f}", file=sys.stderr)

wmat1 = np.asarray(soft_mxu._band_matrix(k, T))
wmat2 = np.asarray(soft_mxu._band_matrix(k2, T))


def vary(g, i):
    return g + jnp.float32(1e-12) * i


def mk_full(kk):
    def outer(g0):
        def body(i, carry):
            g, acc = carry
            v, gr = jax.value_and_grad(
                lambda x: jnp.sum(
                    softsdf.soft_sdf_field(
                        x, band, tau=tau, temperature=T, gray_range=(0.0, 255.0)
                    )
                )
            )(g)
            return (g - jnp.float32(1e-6) * gr, acc + v)
        _, acc = jax.lax.fori_loop(0, kk, body, (g0, jnp.float32(0)))
        return acc
    return outer


def mk_fwd(kk):
    def outer(g0):
        def body(i, acc):
            f = softsdf.soft_sdf_field(
                vary(g0, i), band, tau=tau, temperature=T, gray_range=(0.0, 255.0)
            )
            return acc + jnp.sum(f)
        return jax.lax.fori_loop(0, kk, body, jnp.float32(0))
    return outer


def mk_convs_fwd(kk):
    """Both fields through both cascaded convs (no logits/exp/log tails)."""
    w1 = jnp.asarray(wmat1)
    w2 = jnp.asarray(wmat2)

    def outer(e0):
        def body(i, acc):
            e = vary(e0, i)
            a = soft_mxu._conv_cols(soft_mxu._conv_rows(e, w1, k), w2, k2)
            b = soft_mxu._conv_cols(soft_mxu._conv_rows(e * 0.5, w1, k), w2, k2)
            return acc + jnp.sum(a) + jnp.sum(b)
        return jax.lax.fori_loop(0, kk, body, jnp.float32(0))
    return outer


def mk_convs_fwd_bwd(kk):
    w1 = jnp.asarray(wmat1)
    w2 = jnp.asarray(wmat2)

    def loss(e):
        a = soft_mxu._conv_cols(soft_mxu._conv_rows(e, w1, k), w2, k2)
        b = soft_mxu._conv_cols(soft_mxu._conv_rows(e * 0.5, w1, k), w2, k2)
        return jnp.sum(a) + jnp.sum(b)

    def outer(e0):
        def body(i, carry):
            e, acc = carry
            v, gr = jax.value_and_grad(loss)(e)
            return (e - jnp.float32(1e-12) * gr, acc + v)
        _, acc = jax.lax.fori_loop(0, kk, body, (e0, jnp.float32(0)))
        return acc
    return outer


def mk_rows_only(kk):
    w1 = jnp.asarray(wmat1)

    def outer(e0):
        def body(i, acc):
            a = soft_mxu._conv_rows(vary(e0, i), w1, k)
            return acc + jnp.sum(a)
        return jax.lax.fori_loop(0, kk, body, jnp.float32(0))
    return outer


def mk_cols_only(kk):
    w2 = jnp.asarray(wmat2)

    def outer(e0):
        def body(i, acc):
            a = soft_mxu._conv_cols(vary(e0, i), w2, k2)
            return acc + jnp.sum(a)
        return jax.lax.fori_loop(0, kk, body, jnp.float32(0))
    return outer


def mk_tails_only(kk):
    """Everything EXCEPT the convs: logits -> exp, then neglog -> sqrt -> field."""
    def outer(g0):
        def body(i, acc):
            g = vary(g0, i)
            logits = threshold.soft_logits(g, tau=tau)
            ls_in = jax.nn.log_sigmoid(logits)
            ls_out = ls_in - logits
            ct1 = jnp.float32(shift / T)
            e_in = jnp.exp(ct1 + ls_in)
            e_out = jnp.exp(ct1 + ls_out)
            d2_in = soft_mxu._safe_neglog(e_in, T, shift, 1e9)
            d2_out = soft_mxu._safe_neglog(e_out, T, shift, 1e9)
            d_in = jnp.sqrt(jnp.maximum(d2_in, 0) + jnp.float32(eps))
            d_out = jnp.sqrt(jnp.maximum(d2_out, 0) + jnp.float32(eps))
            f = d_out - jnp.maximum(d_in - 1.0, 0.0)
            return acc + jnp.sum(f)
        return jax.lax.fori_loop(0, kk, body, jnp.float32(0))
    return outer


e4k = jnp.asarray(rng.random((N, N)).astype(np.float32))

t_full = slope_ms(mk_full, gray)
print(f"full fwd+bwd      : {t_full:7.3f} ms", file=sys.stderr)
t_fwd = slope_ms(mk_fwd, gray)
print(f"fwd only          : {t_fwd:7.3f} ms  (bwd ~ {t_full-t_fwd:.3f})", file=sys.stderr)
t_cfb = slope_ms(mk_convs_fwd_bwd, e4k)
print(f"convs fwd+bwd     : {t_cfb:7.3f} ms", file=sys.stderr)
t_cf = slope_ms(mk_convs_fwd, e4k)
print(f"convs fwd         : {t_cf:7.3f} ms", file=sys.stderr)
t_r = slope_ms(mk_rows_only, e4k)
print(f"conv_rows x1 fwd  : {t_r:7.3f} ms", file=sys.stderr)
t_c = slope_ms(mk_cols_only, e4k)
print(f"conv_cols x1 fwd  : {t_c:7.3f} ms", file=sys.stderr)
t_t = slope_ms(mk_tails_only, gray)
print(f"tails (no convs)  : {t_t:7.3f} ms", file=sys.stderr)

flops_fwd = 2 * 2 * N * (N // 128) * (128 + 2 * k) * 128 * 2  # 2 passes x 2 fields
print(
    f"useful einsum flops fwd ~{flops_fwd/1e9:.1f} GFLOP; "
    f"at 197 TF/s bf16 x6-pass -> {flops_fwd*6/197e12*1e3:.2f} ms",
    file=sys.stderr,
)
