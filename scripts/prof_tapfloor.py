"""In-VMEM tap-throughput ceiling: the pass-2 center-tap pattern
(pair-min + add + acc-min over (rc,128) f32 chunks) with no skip logic,
no fill, no output transform — the irreducible per-tap cost."""
import os, sys, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
from _timing import device_ms_per_iter

N = 4096
NTAPS = 16   # the mandatory center work: dy=1..8 x 2 fields
RC = 256

def kern(g_ref, out_ref, acc_ref):
    h = out_ref.shape[0]
    for r in range(0, h, RC):
        rc = min(RC, h - r)
        acc = g_ref[r + 16 : r + 16 + rc, :]
        for t in range(1, NTAPS + 1):
            dy = ((t - 1) % 8) + 1
            pair = jnp.minimum(
                g_ref[r + 16 - dy : r + 16 - dy + rc, :],
                g_ref[r + 16 + dy : r + 16 + dy + rc, :],
            )
            acc = jnp.minimum(acc, pair + jnp.float32(dy * dy))
        out_ref[r : r + rc, :] = acc

def tapbench(g):
    hext = N + 32
    return pl.pallas_call(
        kern,
        grid=(N // 128,),
        in_specs=[pl.BlockSpec((hext, 128), lambda j: (0, j), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((N, 128), lambda j: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((RC, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
    )(g)

rng = np.random.default_rng(0)
g = jnp.asarray(rng.random((N + 32, N)).astype(np.float32) * 100)

def body(i, g):
    gi = g + (i % 2).astype(jnp.float32)
    return jnp.sum(tapbench(gi)[:64, :64])

ms, _, _ = device_ms_per_iter(body, g, reps=3)
# subtract the input-perturbation pass (~0.08 ms for 67MB rw)
print(f"{NTAPS} taps over 4K: {ms:.3f} ms -> {ms/NTAPS*1e3:.1f} us/tap-pass "
      f"({N*N*3/ (ms/NTAPS/1e3) /1e12:.2f} T f32 min/add ops/s)", flush=True)
os._exit(0)
