"""Signed merge + byte remap (reference L3 tail).

Float32 operation order mirrors the C code exactly so the output bytes are
bit-identical: signed_merge <- transform_float_sub (openmp/sdfgen.c:98-106),
remap_to_byte <- transform_float_to_byte (openmp/sdfgen.c:75-96),
and the OpenCL variant <- linear_remap + sign rule (opencl/sdf.cl:17-23,
206-219).
"""

from __future__ import annotations

import jax.numpy as jnp


def signed_merge(outside: jnp.ndarray, inside: jnp.ndarray) -> jnp.ndarray:
    """outside - (inside > 0 ? inside - 1 : inside). The -1 bias puts the
    zero level on boundary pixels (openmp/sdfgen.c:102-104)."""
    biased = jnp.where(inside > 0, inside + jnp.float32(-1.0), inside)
    return outside - biased


def remap_to_byte(vals: jnp.ndarray, spread: int, asymmetric: bool) -> jnp.ndarray:
    """Clamped linear remap [s_min, spread] -> [0, 255] with a truncating u8
    cast, in the reference's exact f32 op order (openmp/sdfgen.c:81-94)."""
    s_min = jnp.float32(0.0) if asymmetric else jnp.float32(-float(spread))
    s_max = jnp.float32(float(spread))
    sn = s_max - s_min
    nd = jnp.float32(255.0)
    v = jnp.minimum(vals, s_max)
    v = jnp.maximum(v, s_min)
    remap = ((v - s_min) * nd) / sn + jnp.float32(0.0)
    return remap.astype(jnp.uint8)


def opencl_sign_and_remap(
    d: jnp.ndarray,
    found: jnp.ndarray,
    this_val: jnp.ndarray,
    spread: int,
    asymmetric: bool,
    invert: bool,
    big: float,
) -> jnp.ndarray:
    """OpenCL kernel tail (opencl/sdf.cl:206-223): decider = invert ^ val;
    dist = found ? (decider ? +d : -(d-1)) : +-INF; clamped remap.
    ``big`` substitutes INFINITY (clamps identically)."""
    decider = jnp.logical_xor(bool(invert), this_val)
    signed = jnp.where(decider, d, -(d + jnp.float32(-1.0)))
    fallback = jnp.where(decider, jnp.float32(big), jnp.float32(-big))
    dist = jnp.where(found, signed, fallback)
    src_min = jnp.float32(0.0) if asymmetric else jnp.float32(-float(spread))
    src_max = jnp.float32(float(spread))
    v = jnp.minimum(dist, src_max)
    v = jnp.maximum(v, src_min)
    sn = src_max - src_min
    remap = ((v - src_min) * jnp.float32(255.0)) / sn + jnp.float32(0.0)
    return remap.astype(jnp.uint8)


def soft_signed_merge(d_out: jnp.ndarray, d_in: jnp.ndarray) -> jnp.ndarray:
    """Differentiable merge consistent with signed_merge: for the hard path
    d_in > 0 implies d_in >= 1, so (d_in > 0 ? d_in - 1 : d_in) == relu(d_in - 1)."""
    return d_out - jnp.maximum(d_in - jnp.float32(1.0), jnp.float32(0.0))


def soft_remap(vals: jnp.ndarray, spread: int, asymmetric: bool, clamp: str = "tanh") -> jnp.ndarray:
    """Differentiable remap to [0, 255] float. clamp: 'hard' (min/max — zero
    gradient outside the range), 'tanh' (smooth saturation), 'none'."""
    s_min = jnp.float32(0.0) if asymmetric else jnp.float32(-float(spread))
    s_max = jnp.float32(float(spread))
    sn = s_max - s_min
    if clamp == "hard":
        v = jnp.clip(vals, s_min, s_max)
    elif clamp == "tanh":
        mid = (s_max + s_min) * jnp.float32(0.5)
        half = sn * jnp.float32(0.5)
        v = mid + half * jnp.tanh((vals - mid) / half)
    else:
        v = vals
    return ((v - s_min) * jnp.float32(255.0)) / sn
