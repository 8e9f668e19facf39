"""On-chip comparison of the soft 4K fwd+bwd paths (two-K slope):
adaptive fused kernels vs MXU pass2='kernel' vs MXU pass2='mm'.
Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/prof_mxu_mm.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from chaq_sdfgen_tpu.ops import soft_mxu, softsdf

    N, spread = 4096, 64
    band = spread + 2
    rng = np.random.default_rng(0)
    gray = jnp.asarray((rng.random((N, N)) * 255).astype(np.float32))
    K1, K2 = 4, 36

    def slope(make_loop, *args, reps=3):
        f1 = jax.jit(make_loop(K1))
        f2 = jax.jit(make_loop(K2))
        float(f1(*args)); float(f2(*args))
        def once(f):
            t0 = time.perf_counter(); float(f(*args)); return time.perf_counter() - t0
        t1 = min(once(f1) for _ in range(reps))
        t2 = min(once(f2) for _ in range(reps))
        return max(t2 - t1, 1e-9) / (K2 - K1) * 1e3

    def bench(name, loss):
        def make(k):
            def outer(g0):
                def body(i, carry):
                    g, acc = carry
                    v, gr = jax.value_and_grad(loss)(g)
                    return (g - jnp.float32(1e-6) * gr, acc + v)
                _, acc = jax.lax.fori_loop(0, k, body, (g0, jnp.float32(0)))
                return acc
            return outer
        ms = slope(make, gray)
        print(f"{name}: {ms:.2f} ms/iter -> {N*N/ms/1e6:.3f} Gpix/s", flush=True)
        return ms

    os.environ["CHAQ_SOFT_MXU"] = "0"
    bench("adaptive fused", lambda g: jnp.sum(
        softsdf.soft_sdf_field(g, spread, tau=2.0, temperature=1.0)))
    os.environ.pop("CHAQ_SOFT_MXU", None)

    bench("mxu pass2=mm    ", lambda g: jnp.sum(
        soft_mxu.soft_sdf_field_mxu(g, band, 2.0, 1.0, 1e-6, pass2="mm")))
    bench("mxu pass2=kernel", lambda g: jnp.sum(
        soft_mxu.soft_sdf_field_mxu(g, band, 2.0, 1.0, 1e-6, pass2="kernel")))

    # forward-only split for the mm path (where does the time go?)
    bench_fwd = lambda name, fn: None
    def fwd(name, fn):
        def make(k):
            def outer(g0):
                def body(i, acc):
                    o = fn(g0 + i.astype(jnp.float32) * jnp.float32(1e-7))
                    return acc + jnp.sum(o[:64])
                return jax.lax.fori_loop(0, k, body, jnp.float32(0))
            return outer
        ms = slope(make, gray)
        print(f"{name} (fwd only): {ms:.2f} ms/iter", flush=True)

    fwd("mxu mm", lambda g: soft_mxu.soft_sdf_field_mxu(g, band, 2.0, 1.0, 1e-6, pass2="mm"))


if __name__ == "__main__":
    try:
        main()
    finally:
        os._exit(0)
