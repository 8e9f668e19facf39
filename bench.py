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

# Timing methodology: each host->device dispatch through this dev
# harness's tunnel costs a CONSTANT ~29 ms regardless of program
# (measured: an empty K-iteration fori_loop with a scalar readback takes
# the same ~29 ms as real work). Dividing one call's wall clock by K
# therefore inflates every per-iteration number by ~29/K ms — the round-1
# numbers did exactly that. Fix: time the same in-graph loop at two
# iteration counts and take the slope, which cancels the constant
# dispatch exactly (the reference's own headline numbers are
# kernel-event times, opencl/main.cpp:333-356 — dispatch-free is the
# apples-to-apples comparison). Loop bodies vary their input with the
# loop index so XLA cannot fold iterations.
_K1, _K2 = 4, 36


def _slope_ms(make_loop, *args, reps=4):
    """Per-iteration ms of make_loop(k)(*args) via the two-K slope."""
    import jax

    f1 = jax.jit(make_loop(_K1))
    f2 = jax.jit(make_loop(_K2))
    float(f1(*args))  # warm + compile
    float(f2(*args))

    def once(f):
        t0 = time.perf_counter()
        float(f(*args))
        return time.perf_counter() - t0

    t1 = min(once(f1) for _ in range(reps))
    t2 = min(once(f2) for _ in range(reps))
    return max(t2 - t1, 1e-9) / (_K2 - _K1) * 1e3


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
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

    # --- hard forward ---
    b4k = jnp.asarray(rng.random((N, N)) < 0.3)

    def hard_loop(k):
        def outer(x):
            def body(i, acc):
                o = pallas_edt.fused_sdf_bytes(jnp.logical_xor(x, i % 2 == 1), spread)
                return acc + jnp.sum(o[:64].astype(jnp.float32))
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))
        return outer

    dt_hard = _slope_ms(hard_loop, b4k) / 1e3
    hard_pps = N * N / dt_hard
    err(f"hard 4K fwd: {dt_hard*1e3:.2f} ms/iter -> {hard_pps/1e9:.3f} Gpix/s")

    # --- soft forward+backward ---
    gray = jnp.asarray((rng.random((N, N)) * 255).astype(np.float32))

    # declared u8 range -> MXU pass-1 dispatch (ops/soft_mxu.py); the
    # SGD update drifts pixels ~1e-6 outside [0,255], within the path's
    # documented graceful-overshoot margin
    def loss(g):
        return jnp.sum(
            softsdf.soft_sdf_field(
                g, spread, tau=2.0, temperature=1.0, gray_range=(0.0, 255.0)
            )
        )

    def soft_loop(k):
        def outer(g0):
            # SGD-on-pixels: each iteration is a full train step (fwd +
            # bwd + update); the update varies the input so nothing folds
            def body(i, carry):
                g, acc = carry
                v, gr = jax.value_and_grad(loss)(g)
                return (g - jnp.float32(1e-6) * gr, acc + v)
            _, acc = jax.lax.fori_loop(0, k, body, (g0, jnp.float32(0)))
            return acc
        return outer

    dt_soft = _slope_ms(soft_loop, gray, reps=3) / 1e3
    soft_pps = N * N / dt_soft
    err(f"soft 4K fwd+bwd: {dt_soft*1e3:.2f} ms/iter -> {soft_pps/1e9:.3f} Gpix/s")

    extras = {}

    # --- adaptive-kernel soft path (no declared range — the trained-image
    #     regime keeps the value-adaptive F1/B1 kernels) ---
    try:
        def loss_ad(g):
            return jnp.sum(softsdf.soft_sdf_field(g, spread, tau=2.0, temperature=1.0))

        def soft_ad_loop(k):
            def outer(g0):
                def body(i, carry):
                    g, acc = carry
                    v, gr = jax.value_and_grad(loss_ad)(g)
                    return (g - jnp.float32(1e-6) * gr, acc + v)
                _, acc = jax.lax.fori_loop(0, k, body, (g0, jnp.float32(0)))
                return acc
            return outer

        dt = _slope_ms(soft_ad_loop, gray, reps=3) / 1e3
        extras["soft_adaptive_fwd_bwd_pixels_per_s"] = round(N * N / dt, 1)
        err(f"soft adaptive 4K fwd+bwd: {dt*1e3:.2f} ms/iter -> {N*N/dt/1e9:.3f} Gpix/s")
    except Exception as e:
        err("adaptive soft bench failed:", repr(e))

    # --- the adaptive KERNELS themselves (runtime-range gate disabled):
    #     the floor for truly out-of-gamut trained images, and the honest
    #     baseline for the sharded adaptive split's overhead ---
    dt_ad_forced = None
    try:
        import os as _os_b

        _os_b.environ["CHAQ_SOFT_RT"] = "0"
        try:
            dt_ad_forced = _slope_ms(soft_ad_loop, gray, reps=3) / 1e3
        finally:
            _os_b.environ.pop("CHAQ_SOFT_RT", None)
        extras["soft_adaptive_forced_fwd_bwd_pixels_per_s"] = round(
            N * N / dt_ad_forced, 1
        )
        err(
            f"soft adaptive-forced 4K fwd+bwd: {dt_ad_forced*1e3:.2f} ms/iter -> "
            f"{N*N/dt_ad_forced/1e9:.3f} Gpix/s"
        )
    except Exception as e:
        err("adaptive-forced soft bench failed:", repr(e))

    # --- BRUTE (OpenCL-parity) 4K fwd, spread 64, fused Pallas kernel ---
    try:
        from chaq_sdfgen_tpu.ops import pallas_brute

        def brute_loop(k):
            def outer(x):
                def body(i, acc):
                    o = pallas_brute.brute_sdf_bytes_pallas(
                        jnp.logical_xor(x, i % 2 == 1), spread
                    )
                    return acc + jnp.sum(o[:64].astype(jnp.float32))
                return jax.lax.fori_loop(0, k, body, jnp.float32(0))
            return outer

        dt = _slope_ms(brute_loop, b4k, reps=3) / 1e3
        dt_brute = dt
        extras["brute_fwd_pixels_per_s"] = round(N * N / dt, 1)
        err(f"brute 4K fwd: {dt*1e3:.2f} ms/iter -> {N*N/dt/1e9:.3f} Gpix/s")
    except Exception as e:  # pragma: no cover - bench resilience
        dt_brute = None
        err("brute bench failed:", repr(e))

    # --- JFA (scale-out algorithm) 4K fwd ---
    try:
        from chaq_sdfgen_tpu.ops import jfa

        def jfa_loop(k):
            def outer(x):
                def body(i, acc):
                    d = jfa.jfa_distance(jnp.logical_xor(x, i % 2 == 1))
                    return acc + jnp.sum(d)
                return jax.lax.fori_loop(0, k, body, jnp.float32(0))
            return outer

        dt = _slope_ms(jfa_loop, b4k, reps=3) / 1e3
        extras["jfa_fwd_pixels_per_s"] = round(N * N / dt, 1)
        err(f"jfa 4K fwd: {dt*1e3:.2f} ms/iter -> {N*N/dt/1e9:.3f} Gpix/s")
    except Exception as e:
        err("jfa bench failed:", repr(e))

    # --- EXACT full-range distance field (what jfa_distance approximates,
    #     without its rare misses): u16 strips + looped-group adaptive
    #     band kernel, i32-exact d^2 ---
    try:
        def exactd_loop(k):
            def outer(x):
                def body(i, acc):
                    d = pallas_edt.exact_distance_field(jnp.logical_xor(x, i % 2 == 1))
                    return acc + jnp.sum(d[:64])
                return jax.lax.fori_loop(0, k, body, jnp.float32(0))
            return outer

        dt = _slope_ms(exactd_loop, b4k, reps=3) / 1e3
        extras["exact_fullrange_dist_pixels_per_s"] = round(N * N / dt, 1)
        err(
            f"exact full-range distance 4K: {dt*1e3:.2f} ms/iter -> "
            f"{N*N/dt/1e9:.3f} Gpix/s"
        )
    except Exception as e:
        err("exact distance bench failed:", repr(e))

    # --- large-spread hard (VERDICT r3 item 4): the reference EDT is
    #     O(n^2) at ANY spread (openmp/df.c:29-136); the u16-strip path
    #     keeps the fused kernels exact beyond the u8 ceiling. Target:
    #     -s 1024 within ~3x of the spread-64 time. ---
    for big_spread in (256, 1024):
        try:
            def hardls_loop(k, sp=big_spread):
                def outer(x):
                    def body(i, acc):
                        o = pallas_edt.fused_sdf_bytes(
                            jnp.logical_xor(x, i % 2 == 1), sp
                        )
                        return acc + jnp.sum(o[:64].astype(jnp.float32))
                    return jax.lax.fori_loop(0, k, body, jnp.float32(0))
                return outer

            dt = _slope_ms(hardls_loop, b4k, reps=3) / 1e3
            extras[f"hard_s{big_spread}_fwd_pixels_per_s"] = round(N * N / dt, 1)
            extras[f"hard_s{big_spread}_vs_s64"] = round(dt / dt_hard, 2)
            err(
                f"hard 4K fwd -s {big_spread}: {dt*1e3:.2f} ms/iter "
                f"({dt/dt_hard:.2f}x the -s 64 time)"
            )
        except Exception as e:
            err(f"large-spread {big_spread} bench failed:", repr(e))

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

        def atlas_loop(k):
            def outer(x):
                def body(i, acc):
                    o = hard_sdf_exact_from_bool(jnp.logical_xor(x, i % 2 == 1), spread)
                    return acc + jnp.sum(o[:, :64].astype(jnp.float32))
                return jax.lax.fori_loop(0, k, body, jnp.float32(0))
            return outer

        dt = _slope_ms(atlas_loop, gstack, reps=3) / 1e3
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

        def shard_loop(k):
            def outer(x):
                def body(i, acc):
                    o = sharded_hard_sdf_bytes(
                        jnp.logical_xor(x, i % 2 == 1), spread, mesh, use_pallas=True,
                        interpret=False,
                    )
                    return acc + jnp.sum(o[:64].astype(jnp.float32))
                return jax.lax.fori_loop(0, k, body, jnp.float32(0))
            return outer

        dt = _slope_ms(shard_loop, b4k, reps=3) / 1e3
        overhead = dt / dt_hard - 1.0
        extras["sharded_1dev_hard_pixels_per_s"] = round(N * N / dt, 1)
        extras["sharded_1dev_overhead_vs_fused"] = round(overhead, 4)
        err(
            f"sharded(1-dev mesh) 4K hard: {dt*1e3:.2f} ms/iter "
            f"({overhead*100:+.1f}% vs unsharded)"
        )
    except Exception as e:
        err("sharded bench failed:", repr(e))

    # --- sharded BRUTE (1-dev mesh): row-local pass A + strip halo +
    #     halo-operand dy-scan kernel (OpenCL NDRange analogue) ---
    try:
        from chaq_sdfgen_tpu.parallel.sharded import sharded_brute_sdf_bytes

        def shard_brute_loop(k):
            def outer(x):
                def body(i, acc):
                    o = sharded_brute_sdf_bytes(
                        jnp.logical_xor(x, i % 2 == 1), spread, mesh,
                        interpret=False,
                    )
                    return acc + jnp.sum(o[:64].astype(jnp.float32))
                return jax.lax.fori_loop(0, k, body, jnp.float32(0))
            return outer

        dt = _slope_ms(shard_brute_loop, b4k, reps=3) / 1e3
        extras["sharded_1dev_brute_pixels_per_s"] = round(N * N / dt, 1)
        if dt_brute:
            extras["sharded_1dev_brute_overhead"] = round(dt / dt_brute - 1.0, 4)
            err(
                f"sharded(1-dev) brute 4K fwd: {dt*1e3:.2f} ms/iter "
                f"({(dt/dt_brute-1)*100:+.1f}% vs unsharded)"
            )
    except Exception as e:
        err("sharded brute bench failed:", repr(e))

    # --- sharded soft (1-dev mesh): the fused-kernel split the flagship
    #     mesh train step runs (pass1_s1 local + s1 halo + pass2_ext) ---
    try:
        from chaq_sdfgen_tpu.parallel.sharded import sharded_soft_sdf_field

        def shard_soft_loop(k):
            def outer(g0):
                def body(i, carry):
                    g, acc = carry
                    v, gr = jax.value_and_grad(
                        lambda x: jnp.sum(
                            sharded_soft_sdf_field(
                                x, spread, mesh, tau=2.0, temperature=1.0,
                                use_fused=True, interpret=False,
                            )
                        )
                    )(g)
                    return (g - jnp.float32(1e-6) * gr, acc + v)
                _, acc = jax.lax.fori_loop(0, k, body, (g0, jnp.float32(0)))
                return acc
            return outer

        dt = _slope_ms(shard_soft_loop, gray, reps=3) / 1e3
        extras["sharded_1dev_soft_fwd_bwd_pixels_per_s"] = round(N * N / dt, 1)
        if dt_ad_forced:
            # vs the adaptive KERNELS (this split's own unsharded body) —
            # the runtime-gated headline is a different pipeline
            extras["sharded_1dev_soft_overhead_vs_adaptive"] = round(
                dt / dt_ad_forced - 1.0, 4
            )
        err(f"sharded(1-dev) soft 4K fwd+bwd: {dt*1e3:.2f} ms/iter -> {N*N/dt/1e9:.3f} Gpix/s")
    except Exception as e:
        err("sharded soft bench failed:", repr(e))

    # --- sharded soft via the collapsed-mm split (declared u8 range —
    #     the production atlas path; K2-row pass-1-sum halo) ---
    try:
        def shard_soft_mm_loop(k):
            def outer(g0):
                def body(i, carry):
                    g, acc = carry
                    v, gr = jax.value_and_grad(
                        lambda x: jnp.sum(
                            sharded_soft_sdf_field(
                                x, spread, mesh, tau=2.0, temperature=1.0,
                                gray_range=(0.0, 255.0), use_mm=True,
                                interpret=False,
                            )
                        )
                    )(g)
                    return (g - jnp.float32(1e-6) * gr, acc + v)
                _, acc = jax.lax.fori_loop(0, k, body, (g0, jnp.float32(0)))
                return acc
            return outer

        dt = _slope_ms(shard_soft_mm_loop, gray, reps=3) / 1e3
        extras["sharded_1dev_soft_mm_pixels_per_s"] = round(N * N / dt, 1)
        # both paths run the same fused mm kernels now; the delta is pure
        # shard_map/halo machinery (VERDICT r3 item 2 target: <= 10%)
        extras["sharded_1dev_soft_mm_overhead"] = round(dt / dt_soft - 1.0, 4)
        err(
            f"sharded(1-dev) soft-mm 4K fwd+bwd: {dt*1e3:.2f} ms/iter -> "
            f"{N*N/dt/1e9:.3f} Gpix/s ({(dt/dt_soft-1)*100:+.1f}% vs unsharded)"
        )
    except Exception as e:
        err("sharded soft-mm bench failed:", repr(e))

    # --- sharded JFA (1-dev mesh): per-stride fetch_row_slab exchanges ---
    try:
        from chaq_sdfgen_tpu.parallel.sharded import sharded_jfa_distance

        def shard_jfa_loop(k):
            def outer(x):
                def body(i, acc):
                    d = sharded_jfa_distance(jnp.logical_xor(x, i % 2 == 1), mesh)
                    return acc + jnp.sum(d)
                return jax.lax.fori_loop(0, k, body, jnp.float32(0))
            return outer

        dt = _slope_ms(shard_jfa_loop, b4k, reps=3) / 1e3
        extras["sharded_1dev_jfa_pixels_per_s"] = round(N * N / dt, 1)
        err(f"sharded(1-dev) jfa 4K fwd: {dt*1e3:.2f} ms/iter -> {N*N/dt/1e9:.3f} Gpix/s")
    except Exception as e:
        err("sharded jfa bench failed:", repr(e))

    # --- batched soft fwd+bwd (atlas-shaped training step, Pallas path
    #     via vmap — BASELINE configs 4/5 hybrid): 8 x 1K x 1K ---
    try:
        gray_b = jnp.asarray((rng.random((8, 1024, 1024)) * 255).astype(np.float32))

        def softb_loop(k):
            def outer(g0):
                def body(i, carry):
                    g, acc = carry
                    v, gr = jax.value_and_grad(
                        lambda x: jnp.sum(
                            softsdf.soft_sdf_field(
                                x, spread, tau=2.0, temperature=1.0,
                                gray_range=(0.0, 255.0),
                            )
                        )
                    )(g)
                    return (g - jnp.float32(1e-6) * gr, acc + v)
                _, acc = jax.lax.fori_loop(0, k, body, (g0, jnp.float32(0)))
                return acc
            return outer

        dt = _slope_ms(softb_loop, gray_b, reps=3) / 1e3
        npx = int(np.prod(gray_b.shape))
        extras["soft_batched_8x1k_fwd_bwd_pixels_per_s"] = round(npx / dt, 1)
        err(f"soft batched 8x1K fwd+bwd: {dt*1e3:.2f} ms/iter -> {npx/dt/1e9:.3f} Gpix/s")
    except Exception as e:
        err("batched soft bench failed:", repr(e))

    # --- HBM roofline context: the hard pipeline's unavoidable traffic
    #     (read bool 16 MB + pass-1 strips out 2x~18 MB + pass-2 strips in
    #     + u8 out 16 MB ~= 104 MB) against the measured ~850 GB/s
    #     effective HBM. A fraction << 1 means the pipeline is
    #     VPU-compute-bound, not bandwidth-bound. ---
    hbm_gbps = 850.0
    hard_traffic_mb = 104.0
    extras["hard_hbm_sol_ms"] = round(hard_traffic_mb / hbm_gbps, 4)  # MB/(GB/s) = ms
    extras["hard_fraction_of_hbm_roofline"] = round(
        (hard_traffic_mb / hbm_gbps) / (N * N / hard_pps * 1e3), 4
    )

    # --- VPU compute roofline: the hard/brute kernels are stencil
    #     (tap-pass) bound, not HBM bound; the honest efficiency figure is
    #     tap passes. One 4K tap-pass (slice + add/min over the full
    #     image) costs ~0.146 ms on the v5e VPU (measured 4.67 ms per
    #     32-tap stencil sweep, scripts/prof_micro.py). A DENSE scan of
    #     the spread-64 band is 2 fields x 133 dy taps = 266 tap passes
    #     (38.8 ms); the adaptive skip bounds get the measured time down
    #     to the equivalent of a few dense passes. ---
    vpu_tap_ms = 4.67 / 32
    extras["vpu_tap_pass_ms_4k"] = round(vpu_tap_ms, 4)
    dense_taps_hard = 2 * (2 * (spread + 2) + 1)
    extras["hard_dense_tap_floor_ms"] = round(dense_taps_hard * vpu_tap_ms, 2)
    extras["hard_equivalent_dense_tap_passes"] = round(
        (N * N / hard_pps * 1e3) / vpu_tap_ms, 1
    )
    if "brute_fwd_pixels_per_s" in extras:
        dense_taps_brute = 2 * (2 * spread + 1)
        extras["brute_dense_tap_floor_ms"] = round(dense_taps_brute * vpu_tap_ms, 2)
        extras["brute_equivalent_dense_tap_passes"] = round(
            (N * N / extras["brute_fwd_pixels_per_s"] * 1e3) / vpu_tap_ms, 1
        )

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
