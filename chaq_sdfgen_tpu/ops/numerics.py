"""Numerics helpers for bit-exact parity.

XLA lowers sqrt to a rsqrt-based approximation on some backends (observed:
sqrt(3600) -> 59.999996 on CPU), while the reference uses C's correctly
rounded sqrtf (openmp/df.c:95). ``refined_sqrt`` recovers the correctly
rounded float32 square root for our radicands (exact integers < 2^24) with
one Newton step evaluated in double-float32 via a Veltkamp split — pure VPU
ops, no float64, no lookup tables.
"""

from __future__ import annotations

import jax.numpy as jnp


def refined_sqrt(n: jnp.ndarray) -> jnp.ndarray:
    """Correctly rounded float32 sqrt of exactly-representable non-negative
    float32 values (integers < 2^24 in our use).

    s0 = approx sqrt; the residual e = n - s0^2 is computed exactly by
    splitting s0 into high/low 12-bit halves (Veltkamp split, C = 2^12+1);
    the final IEEE-correct addition s0 + e/(2*s0) rounds the double-float32
    result to the nearest float32, which is RN(sqrt(n)) except for
    ~2^-40-relative ties that exact integers cannot produce.
    """
    n = n.astype(jnp.float32)
    s0 = jnp.sqrt(n)
    c = s0 * jnp.float32(4097.0)
    hi = c - (c - s0)
    lo = s0 - hi
    # exact expansion of n - s0*s0
    e = ((n - hi * hi) - (jnp.float32(2.0) * hi) * lo) - lo * lo
    # guard against s0 == 0 (n == 0): correction is 0/0 -> force 0
    denom = jnp.float32(2.0) * s0
    corr = jnp.where(n > 0, e / jnp.where(denom > 0, denom, jnp.float32(1.0)), jnp.float32(0.0))
    return jnp.where(n > 0, s0 + corr, jnp.float32(0.0))
