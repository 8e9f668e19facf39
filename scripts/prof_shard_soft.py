"""Bisect the sharded ADAPTIVE-soft 1-dev overhead (round-4 bench:
13.8 ms vs 9.4 unsharded = +47%; the only path for out-of-gamut inputs).

Variants, all 4K, slope-timed, fwd+bwd (and fwd-only where marked):
  A  unsharded adaptive pipeline (CHAQ_SOFT_RT=0)          [the baseline]
  B  unsharded adaptive on a (4096+2*72)-row input          [window compute]
  C  shard_map(1-dev) around the PLAIN unsharded body       [boundary cost]
  D  sharded fused_impl='window' (the bench's measurement)
  E  sharded fused_impl='split'
  F  fwd-only: A and D
"""

import os

os.environ["CHAQ_SOFT_RT"] = "0"  # force the adaptive kernels everywhere

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from _timing import device_ms_per_iter
from chaq_sdfgen_tpu.ops import softsdf
from chaq_sdfgen_tpu.parallel import mesh as meshlib
from chaq_sdfgen_tpu.parallel.sharded import sharded_soft_sdf_field

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")

N = 4096
SPREAD = 64
rng = np.random.default_rng(0)
gray = jnp.asarray((rng.random((N, N)) * 255).astype(np.float32))
mesh = meshlib.make_mesh((1,), ("y",))


def train_body(loss):
    def body(i, g):
        v, gr = jax.value_and_grad(loss)(g)
        return v + jnp.float32(0.0) * jnp.sum(gr[:1, :1])

    # body must consume i via the input perturbation instead
    def body2(i, g):
        gi = g + (i % 2).astype(jnp.float32) * jnp.float32(1e-6)
        v, gr = jax.value_and_grad(loss)(gi)
        return v + jnp.sum(gr[:1, :8])

    return body2


def fwd_body(loss):
    def body(i, g):
        gi = g + (i % 2).astype(jnp.float32) * jnp.float32(1e-6)
        return loss(gi)

    return body


def loss_plain(g):
    return jnp.sum(softsdf.soft_sdf_field(g, SPREAD, tau=2.0, temperature=1.0))


def report(tag, ms):
    print(f"{tag}: {ms:.2f} ms/iter", flush=True)


def main():
    print("backend:", jax.default_backend(), jax.devices()[:1], flush=True)

    ms, _, _ = device_ms_per_iter(train_body(loss_plain), gray, reps=3)
    report("A  unsharded adaptive fwd+bwd", ms)
    base = ms

    ms, _, _ = device_ms_per_iter(fwd_body(loss_plain), gray, reps=3)
    report("F1 unsharded adaptive fwd-only", ms)

    gray_ext = jnp.asarray(
        (rng.random((N + 144, N)) * 255).astype(np.float32)
    )
    ms, _, _ = device_ms_per_iter(train_body(loss_plain), gray_ext, reps=3)
    report("B  unsharded adaptive, H+144 rows fwd+bwd", ms)

    # C: shard_map(1-dev) around the plain body, no halo machinery
    wrapped = jax.shard_map(
        lambda g: softsdf.soft_sdf_field(g, SPREAD, tau=2.0, temperature=1.0),
        mesh=mesh, in_specs=(P("y", None),), out_specs=P("y", None),
        check_vma=False,
    )

    def loss_wrapped(g):
        return jnp.sum(wrapped(g))

    ms, _, _ = device_ms_per_iter(train_body(loss_wrapped), gray, reps=3)
    report(f"C  shard_map(plain body) fwd+bwd (base {base:.2f})", ms)

    for impl in ("window", "split"):
        def loss_sh(g, impl=impl):
            return jnp.sum(
                sharded_soft_sdf_field(
                    g, SPREAD, mesh, tau=2.0, temperature=1.0,
                    use_fused=True, fused_impl=impl, interpret=False,
                )
            )

        ms, _, _ = device_ms_per_iter(train_body(loss_sh), gray, reps=3)
        report(f"D/E sharded fused_impl={impl} fwd+bwd", ms)
        if impl == "window":
            ms, _, _ = device_ms_per_iter(fwd_body(loss_sh), gray, reps=3)
            report("F2 sharded window fwd-only", ms)


if __name__ == "__main__":
    main()
    os._exit(0)
