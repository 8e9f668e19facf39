"""Headline benchmark — prints ONE JSON line (BASELINE.md targets).

Measures, on the real chip:
  1. hard EXACT 4Kx4K forward (fused Pallas pipeline, OpenMP-binary
     byte-parity semantics), spread 64
  2. soft differentiable 4Kx4K forward+backward (value_and_grad wrt input
     pixels through the Pallas soft-min kernels), spread 64
  3. a golden-sample parity guard (the numbers only count if output bytes
     are exact)

Headline metric (stdout JSON): soft fwd+bwd pixels/s/chip vs the 1 Gpix/s
BASELINE target. Secondary numbers go to stderr.
"""

import json
import sys
import time

import numpy as np


def _time_best(fn, iters=5):
    fn()  # warm
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sdfref import oracle
    from chaq_sdfgen_tpu.ops import pallas_edt, softsdf

    err = lambda *a: print(*a, file=sys.stderr, flush=True)
    err("backend:", jax.default_backend(), jax.devices())

    N = 4096
    spread = 64
    rng = np.random.default_rng(0)

    # --- parity guard (golden sample through the fused kernel) ---
    img = oracle.load_image_gray_alpha("/root/reference/image/sample_input.png")
    from PIL import Image

    golden = np.asarray(Image.open("/root/reference/image/sample_output.png"))
    bb = oracle.img_to_bool(img, channel=0)
    got = np.asarray(pallas_edt.fused_sdf_bytes(jnp.asarray(bb), 100, asymmetric=True))
    parity_ok = bool((got == golden).all())
    err("golden parity:", "OK" if parity_ok else "FAIL")

    # Timing note: each host->device dispatch through this dev harness's
    # tunnel costs ~30 ms regardless of work (measured: a trivial sum on
    # the same 4K input takes 30.4 ms). Device throughput is therefore
    # measured with K iterations inside ONE jitted program (inputs varied
    # per iteration so nothing folds), dispatch amortized away.
    K = 8

    # --- hard forward ---
    b4k = jnp.asarray(rng.random((N, N)) < 0.3)

    def hard_many(x):
        def body(i, acc):
            o = pallas_edt.fused_sdf_bytes(jnp.logical_xor(x, i % 2 == 1), spread)
            return acc + jnp.sum(o.astype(jnp.int32))
        return jax.lax.fori_loop(0, K, body, jnp.int32(0))

    hard = jax.jit(hard_many)
    dt_hard = _time_best(lambda: int(hard(b4k))) / K
    hard_pps = N * N / dt_hard
    err(f"hard 4K fwd: {dt_hard*1e3:.2f} ms/iter -> {hard_pps/1e9:.3f} Gpix/s")

    # --- soft forward+backward ---
    gray = jnp.asarray((rng.random((N, N)) * 255).astype(np.float32))

    def loss(g):
        return jnp.sum(softsdf.soft_sdf_field(g, spread, tau=2.0, temperature=1.0))

    def soft_many(g0):
        # SGD-on-pixels: each iteration is a full train step (fwd + bwd +
        # update); the update varies the input so nothing folds
        def body(i, carry):
            g, acc = carry
            v, gr = jax.value_and_grad(loss)(g)
            return (g - jnp.float32(1e-6) * gr, acc + v)
        _, acc = jax.lax.fori_loop(0, K, body, (g0, jnp.float32(0)))
        return acc

    vg = jax.jit(soft_many)
    dt_soft = _time_best(lambda: float(vg(gray)), iters=3) / K
    soft_pps = N * N / dt_soft
    err(f"soft 4K fwd+bwd: {dt_soft*1e3:.2f} ms/iter -> {soft_pps/1e9:.3f} Gpix/s")

    extras = {}

    # --- BRUTE (OpenCL-parity) 4K fwd, spread 64, fused Pallas kernel ---
    try:
        from chaq_sdfgen_tpu.ops import pallas_brute

        def brute_many(x):
            def body(i, acc):
                o = pallas_brute.brute_sdf_bytes_pallas(
                    jnp.logical_xor(x, i % 2 == 1), spread
                )
                return acc + jnp.sum(o.astype(jnp.int32))
            return jax.lax.fori_loop(0, K, body, jnp.int32(0))

        bf = jax.jit(brute_many)
        dt = _time_best(lambda: int(bf(b4k)), iters=3) / K
        extras["brute_fwd_pixels_per_s"] = round(N * N / dt, 1)
        err(f"brute 4K fwd: {dt*1e3:.2f} ms/iter -> {N*N/dt/1e9:.3f} Gpix/s")
    except Exception as e:  # pragma: no cover - bench resilience
        err("brute bench failed:", repr(e))

    # --- JFA (scale-out algorithm) 4K fwd ---
    try:
        from chaq_sdfgen_tpu.ops import jfa

        def jfa_many(x):
            def body(i, acc):
                d = jfa.jfa_distance(jnp.logical_xor(x, i % 2 == 1))
                return acc + jnp.sum(d)
            return jax.lax.fori_loop(0, K, body, jnp.float32(0))

        jf = jax.jit(jfa_many)
        dt = _time_best(lambda: float(jf(b4k)), iters=3) / K
        extras["jfa_fwd_pixels_per_s"] = round(N * N / dt, 1)
        err(f"jfa 4K fwd: {dt*1e3:.2f} ms/iter -> {N*N/dt/1e9:.3f} Gpix/s")
    except Exception as e:
        err("jfa bench failed:", repr(e))

    # --- glyph-realistic atlas (BASELINE config 5 shape): batched hard
    #     path on synthetic glyph stacks where the adaptive skip bounds
    #     bite (large empty regions), 8 x 1K x 1K ---
    try:
        from chaq_sdfgen_tpu.models.sdf_model import hard_sdf_exact_from_bool

        glyphs = np.zeros((8, 1024, 1024), dtype=bool)
        yy, xx = np.mgrid[0:1024, 0:1024]
        for gi in range(8):
            grng = np.random.default_rng(gi)
            for _ in range(6):  # strokes: random filled ellipses + bars
                cy, cx = grng.integers(128, 896, 2)
                ry, rx = grng.integers(30, 160, 2)
                glyphs[gi] |= ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 < 1.0
            x0, w0 = grng.integers(100, 800), grng.integers(40, 90)
            glyphs[gi][:, x0 : x0 + w0] = True
        gstack = jnp.asarray(glyphs)

        def atlas_many(x):
            def body(i, acc):
                o = hard_sdf_exact_from_bool(jnp.logical_xor(x, i % 2 == 1), spread)
                return acc + jnp.sum(o.astype(jnp.int32))
            return jax.lax.fori_loop(0, K, body, jnp.int32(0))

        af = jax.jit(atlas_many)
        dt = _time_best(lambda: int(af(gstack)), iters=3) / K
        npix = int(np.prod(gstack.shape))
        extras["atlas_glyph_hard_pixels_per_s"] = round(npix / dt, 1)
        err(f"atlas 8x1K glyphs hard: {dt*1e3:.2f} ms/iter -> {npix/dt/1e9:.3f} Gpix/s")
    except Exception as e:
        err("atlas bench failed:", repr(e))

    # --- sharded overhead: 1-device mesh shard_map (Pallas local cores +
    #     halo exchange machinery) vs the unsharded fused kernel ---
    try:
        from jax.sharding import Mesh
        from chaq_sdfgen_tpu.parallel.sharded import sharded_hard_sdf_bytes

        mesh = Mesh(np.array(jax.devices()[:1]), ("y",))

        def shard_many(x):
            def body(i, acc):
                o = sharded_hard_sdf_bytes(
                    jnp.logical_xor(x, i % 2 == 1), spread, mesh, use_pallas=True,
                    interpret=False,
                )
                return acc + jnp.sum(o.astype(jnp.int32))
            return jax.lax.fori_loop(0, K, body, jnp.int32(0))

        sf = jax.jit(shard_many)
        dt = _time_best(lambda: int(sf(b4k)), iters=3) / K
        overhead = dt / dt_hard - 1.0
        extras["sharded_1dev_hard_pixels_per_s"] = round(N * N / dt, 1)
        extras["sharded_1dev_overhead_vs_fused"] = round(overhead, 4)
        err(
            f"sharded(1-dev mesh) 4K hard: {dt*1e3:.2f} ms/iter "
            f"({overhead*100:+.1f}% vs unsharded)"
        )
    except Exception as e:
        err("sharded bench failed:", repr(e))

    value = soft_pps if parity_ok else 0.0
    print(
        json.dumps(
            {
                "metric": "sdf_4k_soft_fwd_bwd_pixels_per_s_per_chip",
                "value": round(value, 1),
                "unit": "pixels/s/chip",
                "vs_baseline": round(value / 1e9, 4),
                "extra": {
                    "hard_fwd_pixels_per_s": round(hard_pps, 1),
                    "golden_parity": parity_ok,
                    "spread": spread,
                    **extras,
                },
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    try:
        main()
    finally:
        import os

        os._exit(0)
