"""Threshold / indicator ops (reference L3 layer).

Hard path mirrors transform_img_to_bool (openmp/sdfgen.c:52-62) and
map_read (opencl/sdf.cl:2-14); the soft path replaces the step with a
temperature-controlled sigmoid so gradients flow to input intensities.
All ops are plain jnp elementwise — XLA fuses them into neighbours.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

THRESHOLD = 127  # the fixed byte threshold (openmp/sdfgen.c:57, sdf.cl:5)


def hard_threshold(img2ch: jnp.ndarray, channel: int = 1, test_above: bool = True) -> jnp.ndarray:
    """(..., H, W, 2) uint8 -> (..., H, W) bool: chan > 127 (or < when
    inverted; the OpenMP -n flag flips the test itself, sdfgen.c:58-59)."""
    chan = img2ch[..., channel]
    return (chan > THRESHOLD) if test_above else (chan < THRESHOLD)


def soft_occupancy(gray: jnp.ndarray, tau: float = 1.0, test_above: bool = True) -> jnp.ndarray:
    """Differentiable occupancy in (0, 1): sigmoid((v - 127.5) / tau).

    127.5 is the midpoint of the hard test (v > 127 <=> v >= 128 for integer
    bytes), so occupancy -> hard_threshold as tau -> 0.
    """
    v = gray.astype(jnp.float32)
    logits = (v - jnp.float32(127.5)) / jnp.float32(tau)
    if not test_above:
        logits = -logits
    return jax.nn.sigmoid(logits)


def indicator(b: jnp.ndarray, true_is_zero: bool, big: float) -> jnp.ndarray:
    """bool -> {0, big} float32 parabola heights (transform_bool_to_float,
    openmp/sdfgen.c:65-72). ``big`` is a finite saturation sentinel instead
    of +inf: it keeps all downstream f32 sums exact and NaN-free while
    clamping to the same output bytes (see SdfConfig.effective_band)."""
    return jnp.where(b == true_is_zero, jnp.float32(0.0), jnp.float32(big))


def soft_logits(gray: jnp.ndarray, tau: float = 1.0, test_above: bool = True) -> jnp.ndarray:
    """Threshold logits l = (v - 127.5)/tau; occupancy = sigmoid(l)."""
    v = gray.astype(jnp.float32)
    logits = (v - jnp.float32(127.5)) / jnp.float32(tau)
    return logits if test_above else -logits


def soft_log_indicator_from_logits(
    logits: jnp.ndarray, temperature: float, seeds_are_on: bool, big: float
) -> jnp.ndarray:
    """Soft parabola heights h = -T*log(o) (seeds on) or -T*log(1-o),
    computed stably from logits: -log(sigmoid(l)) = softplus(-l). This is
    exact where a sigmoid->log round-trip would underflow and create
    phantom weak seeds. Clipped at ``big`` = the hard indicator's sentinel,
    recovering indicator() as tau -> 0."""
    l = logits if seeds_are_on else -logits
    h = jnp.float32(temperature) * jax.nn.softplus(-l)
    return jnp.minimum(h, jnp.float32(big))
