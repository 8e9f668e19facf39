"""JFA stride-cost breakdown on chip (slope-timed, 4K).

Questions:
  - what does ONE stride pass cost (the 13-stride pipeline is 7.7 ms,
    so ~0.6 ms/stride)?
  - is it HBM-bound (8 shifted full-image reads) or VPU-bound
    (~106 int ops/pixel)? -> compare a stride against a stripped variant
    with 2 candidates, and against the validity-guard-free far-sentinel
    encoding.

Run: PYTHONPATH=/root/.axon_site:/root/repo JAX_PLATFORMS=axon \
       python scripts/prof_jfa.py
"""

import sys

sys.path.insert(0, "/root/repo/scripts")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from _timing import device_ms_per_iter
from chaq_sdfgen_tpu.ops import jfa

N = 4096
rng = np.random.default_rng(0)
seeds = jnp.asarray(rng.random((N, N)) < 0.3)

yy = lax.broadcasted_iota(jnp.int32, (N, N), 0)
xx = lax.broadcasted_iota(jnp.int32, (N, N), 1)
xbits = 12
mask = jnp.int32((1 << xbits) - 1)
none = jnp.int32(-1)
p0 = jnp.where(seeds, (yy << xbits) | xx, none)

FAR = jnp.int32(3 * (N - 1))
xb2 = 14
mask2 = jnp.int32((1 << xb2) - 1)
pnone = (FAR << xb2) | FAR
p0f = jnp.where(seeds, (yy << xb2) | xx, pnone)

K = 8


def stride_classic(p, ncand=8):
    sp = p
    sy0 = sp >> xbits
    sx0 = sp & mask
    d2 = jnp.where(sp >= 0, (yy - sy0) ** 2 + (xx - sx0) ** 2, jfa._INVALID_D2)
    done = 0
    for dy in (-K, 0, K):
        for dx in (-K, 0, K):
            if dy == 0 and dx == 0:
                continue
            if done >= ncand:
                break
            done += 1
            cp = jfa._shift2d(sp, dy, dx, none)
            csy = cp >> xbits
            csx = cp & mask
            cd2 = (yy - csy) ** 2 + (xx - csx) ** 2
            cd2 = jnp.where(cp >= 0, cd2, jfa._INVALID_D2)
            take = cd2 < d2
            p = jnp.where(take, cp, p)
            d2 = jnp.minimum(d2, cd2)
    return p


def stride_far(p):
    sp = p
    sy0 = sp >> xb2
    sx0 = sp & mask2
    d2 = (yy - sy0) ** 2 + (xx - sx0) ** 2
    for dy in (-K, 0, K):
        for dx in (-K, 0, K):
            if dy == 0 and dx == 0:
                continue
            cp = jfa._shift2d(sp, dy, dx, pnone)
            csy = cp >> xb2
            csx = cp & mask2
            cd2 = (yy - csy) ** 2 + (xx - csx) ** 2
            take = cd2 < d2
            p = jnp.where(take, cp, p)
            d2 = jnp.minimum(d2, cd2)
    return p


def vary(p, i):
    return p + (i - i)  # consume index without changing values


def run(name, f, p_init):
    # vary the input with the loop index so XLA cannot hoist the body
    # (i & 1 flips packed low bits; shapes/magnitudes unchanged)
    ms, *_ = device_ms_per_iter(
        lambda i, p: jnp.sum((f(p ^ (i & 1)).astype(jnp.float32))[:64]), p_init
    )
    print(f"{name}: {ms:7.3f} ms/stride")
    return ms


def main():
    print("backend:", jax.default_backend())
    # whole pipeline sanity
    ms, *_ = device_ms_per_iter(
        lambda i, s: jnp.sum(jfa.jfa_distance(jnp.logical_xor(s, i % 2 == 1))[:64]),
        seeds,
    )
    print(f"full jfa_distance: {ms:7.3f} ms")
    run("stride classic 8-cand", stride_classic, p0)
    run("stride classic 4-cand", lambda p: stride_classic(p, 4), p0)
    run("stride classic 2-cand", lambda p: stride_classic(p, 2), p0)
    run("stride far-sentinel 8-cand", stride_far, p0f)


if __name__ == "__main__":
    main()
