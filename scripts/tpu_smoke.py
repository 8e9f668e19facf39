"""On-chip smoke: every algorithm mode + gradient path compiled on the TPU."""
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from sdfref import oracle
from chaq_sdfgen_tpu.models.sdf_model import hard_sdf_brute, hard_sdf_jfa, hard_sdf_exact
from chaq_sdfgen_tpu.ops import softsdf

rng = np.random.default_rng(0)
b = rng.random((64, 48)) < 0.3
img2ch = np.zeros((64, 48, 2), dtype=np.uint8)
img2ch[..., 1] = np.where(b, 255, 0)
img2ch[..., 0] = np.where(b, 230, 30)

want = oracle.sdf_pipeline_opencl(img2ch, spread=7)
got = np.asarray(hard_sdf_brute(jnp.asarray(img2ch), spread=7))
print("brute on-chip maxdiff:", np.abs(got.astype(int) - want.astype(int)).max())

wantj = np.asarray(hard_sdf_exact(jnp.asarray(img2ch), spread=9, use_pallas=False))
gotj = np.asarray(hard_sdf_jfa(jnp.asarray(img2ch), spread=9))
dj = np.abs(gotj.astype(int) - wantj.astype(int))
print("jfa-vs-exact on-chip: exact-rate", (dj == 0).mean(), "max", dj.max())

gray = jnp.asarray((rng.random((48, 48)) * 255).astype(np.float32))
gfn = jax.jit(jax.grad(lambda g: jnp.sum(softsdf.soft_sdf_field(g, 6, tau=3.0, temperature=1.0) ** 2)))
gr = np.asarray(gfn(gray))
print("soft grad on-chip finite:", np.isfinite(gr).all(), "nonzero:", (np.abs(gr) > 0).any())

from chaq_sdfgen_tpu.models.atlas import atlas_sdf
from chaq_sdfgen_tpu.config import SdfConfig
imgs = np.zeros((2, 32, 32, 2), dtype=np.uint8)
imgs[..., 1] = np.where(rng.random((2, 32, 32)) < 0.4, 255, 0)
a = np.asarray(atlas_sdf(jnp.asarray(imgs), SdfConfig(spread=5)))
w0 = np.asarray(hard_sdf_exact(jnp.asarray(imgs[0]), spread=5))
print("atlas on-chip matches single:", np.array_equal(a[0], w0))
import os; os._exit(0)
