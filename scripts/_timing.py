"""Slope-based device timing for the tunnel chip.

The dev harness dispatch costs ~29 ms per jitted call REGARDLESS of the
program (measured: an empty K-iteration fori_loop with a scalar readback
takes the same ~29 ms as real work at K=8). Dividing one call's wall
clock by K therefore inflates every per-iteration number by ~29/K ms.

Fix: time the same in-graph loop at two iteration counts and take the
slope — (t(K2) - t(K1)) / (K2 - K1) — which cancels the constant
dispatch exactly. Bodies must consume the loop index so XLA cannot fold
iterations."""
import time

import jax
import jax.numpy as jnp


def loop_at(body, k):
    """Build fn(*args) = fori_loop of `body(i, *args) -> scalar` k times."""
    def outer(*args):
        return jax.lax.fori_loop(
            0, k, lambda i, acc: acc + body(i, *args), jnp.float32(0)
        )
    return outer


def device_ms_per_iter(body, *args, k1=4, k2=36, reps=4):
    """Per-iteration device milliseconds of `body(i, *args) -> scalar`,
    dispatch-free (two-K slope). Returns (ms_per_iter, raw_t1_s, raw_t2_s)."""
    f1 = jax.jit(loop_at(body, k1))
    f2 = jax.jit(loop_at(body, k2))
    float(f1(*args))  # warm/compile
    float(f2(*args))
    t1 = min(_once(f1, args) for _ in range(reps))
    t2 = min(_once(f2, args) for _ in range(reps))
    return max(t2 - t1, 1e-9) / (k2 - k1) * 1e3, t1, t2


def _once(f, args):
    t0 = time.perf_counter()
    float(f(*args))
    return time.perf_counter() - t0
