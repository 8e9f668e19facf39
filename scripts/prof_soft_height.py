"""Height sweep of the unsharded adaptive soft pipeline: localize the
4096 -> 4240 cliff found by prof_shard_soft.py (9.31 -> 12.48 ms fwd+bwd;
shard_map itself measured free). Heights probe the 128-block boundary
(4224 = 33*128, 4352 = 34*128) vs the 8-row-only alignment (4104, 4240)."""

import os

os.environ["CHAQ_SOFT_RT"] = "0"

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from _timing import device_ms_per_iter
from chaq_sdfgen_tpu.ops import softsdf

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")

SPREAD = 64
rng = np.random.default_rng(0)


def train_body(loss):
    def body(i, g):
        gi = g + (i % 2).astype(jnp.float32) * jnp.float32(1e-6)
        v, gr = jax.value_and_grad(loss)(gi)
        return v + jnp.sum(gr[:1, :8])

    return body


def loss(g):
    return jnp.sum(softsdf.soft_sdf_field(g, SPREAD, tau=2.0, temperature=1.0))


def fwd_body(i, g):
    gi = g + (i % 2).astype(jnp.float32) * jnp.float32(1e-6)
    return loss(gi)


print("backend:", jax.default_backend(), flush=True)
for h in (4096, 4104, 4224, 4240, 4352):
    gray = jnp.asarray((rng.random((h, 4096)) * 255).astype(np.float32))
    ms, _, _ = device_ms_per_iter(train_body(loss), gray, reps=3)
    msf, _, _ = device_ms_per_iter(fwd_body, gray, reps=3)
    per_mpix = ms / (h * 4096 / 1e6)
    print(
        f"H={h}: fwd+bwd {ms:.2f} ms (fwd {msf:.2f})  "
        f"{per_mpix*1000:.1f} us/Mpix", flush=True,
    )
os._exit(0)
