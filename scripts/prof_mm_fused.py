"""Slope-timed on-chip comparison: fully-fused mm kernels
(ops/pallas_soft_mm.py) vs the round-3 einsum+p2fused cascade
(ops/soft_mxu.py) at 4K, fwd-only and fwd+bwd.

Run: PYTHONPATH=/root/.axon_site:/root/repo JAX_PLATFORMS=axon \
       python scripts/prof_mm_fused.py
"""

import sys

sys.path.insert(0, "/root/repo/scripts")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from _timing import device_ms_per_iter
from chaq_sdfgen_tpu.ops import soft_mxu, pallas_soft_mm as PM

TAU, T, EPS = 2.0, 1.0, 1e-6
N = 4096
BAND = 66

rng = np.random.default_rng(0)
gray = jnp.asarray((rng.random((N, N)) * 255).astype(np.float32))
w = jnp.asarray(rng.standard_normal((N, N)).astype(np.float32))


def fwd_new(g):
    return PM.soft_field_mm_fused(g, BAND, TAU, T, EPS)


def fwd_old(g):
    return soft_mxu.soft_sdf_field_mxu(g, BAND, TAU, T, EPS)


def vary(g, i):
    return g + jnp.float32(1e-12) * i.astype(jnp.float32)


def main():
    print("backend:", jax.default_backend())
    a = jax.jit(fwd_new)(gray)
    b = jax.jit(fwd_old)(gray)
    err = float(jnp.max(jnp.abs(a - b)))
    print(f"fwd parity max err: {err:.3e}")

    for name, f in [("new", fwd_new), ("old", fwd_old)]:
        ms, *_ = device_ms_per_iter(
            lambda i, g: jnp.sum(f(vary(g, i))[:64]), gray
        )
        print(f"{name} fwd: {ms:7.3f} ms -> {N*N/ms/1e6:7.2f} Gpix/s")

    for name, f in [("new", fwd_new), ("old", fwd_old)]:
        gfn = jax.grad(lambda g: jnp.sum(w * f(g)))
        ms, *_ = device_ms_per_iter(
            lambda i, g: jnp.sum(gfn(vary(g, i))[:64]), gray
        )
        print(f"{name} fwd+bwd: {ms:7.3f} ms -> {N*N/ms/1e6:7.2f} Gpix/s")


if __name__ == "__main__":
    main()
