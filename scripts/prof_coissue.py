"""NEGATIVE RESULT (r5): Mosaic does not co-issue MXU dots with VPU
elementwise chains — interleaved-both times as the SUM of the isolated
chains (1.95 vs 1.08 + 0.80 ms), same with fori_loop VPU bodies
(5.36 vs 1.10 + 4.30). The fused-mm soft floor is therefore ADDITIVE
(MXU + VPU + HBM), and intra-kernel software pipelining cannot hide
the 6-pass HIGHEST matmul time. See NOTES.md round-5."""
import os, sys, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np, jax, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
from _timing import device_ms_per_iter

M, K, NBLK = 256, 96, 64
H, W = 512, 512   # vpu work per step: (512,512) exp+mul ~ MXU dot cost-ish

def hi(x, w):
    return lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32,
                           precision=lax.Precision.HIGHEST)

def mk(mode):
    def kern(a_ref, w_ref, v_ref, out_ref, acc_ref):
        s = jnp.zeros((M, 64), jnp.float32)
        v = v_ref[...]
        for b in range(NBLK):
            if mode in ("mxu", "both"):
                s = s + hi(a_ref[:, b : b + K], w_ref[...])
            if mode in ("vpu", "both"):
                v = jnp.exp(v * jnp.float32(1e-4)) + v * jnp.float32(0.5)
        acc_ref[0:M, 0:64] = s
        acc_ref[0:H, 64:65] = jnp.sum(v, axis=1, keepdims=True) * jnp.float32(1e-30)
        out_ref[...] = acc_ref[...]
    return kern

a = jnp.asarray(np.random.default_rng(0).random((M, K + NBLK)).astype(np.float32))
w = jnp.asarray(np.random.default_rng(1).random((K, 64)).astype(np.float32))
v = jnp.asarray(np.random.default_rng(2).random((H, W)).astype(np.float32))

def run(mode, reps=3):
    f = pl.pallas_call(
        mk(mode),
        grid=(64,),
        in_specs=[pl.BlockSpec(a.shape, lambda j: (0, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec(w.shape, lambda j: (0, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec(v.shape, lambda j: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((H, 128), lambda j: (j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H * 64, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((H, 128), jnp.float32)],
    )
    def body(i, a, w, v):
        ai = a + (i % 2).astype(jnp.float32) * jnp.float32(1e-9)
        return jnp.sum(f(ai, w, v)[:8, :8])
    ms, _, _ = device_ms_per_iter(body, a, w, v, reps=reps)
    return ms

for mode in ("mxu", "vpu", "both"):
    print(f"{mode:5s}: {run(mode):.3f} ms", flush=True)
os._exit(0)
