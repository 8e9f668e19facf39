"""On-chip validation: fused Pallas kernel byte parity vs oracle + timing."""
import time
import numpy as np
import jax, jax.numpy as jnp

print("backend:", jax.default_backend(), jax.devices())

from sdfref import oracle
from chaq_sdfgen_tpu.ops import pallas_edt
from chaq_sdfgen_tpu.models.sdf_model import hard_sdf_exact_from_bool

rng = np.random.default_rng(0)

# parity: small grid vs oracle
b = rng.random((96, 80)) < 0.3
img2ch = np.zeros((96, 80, 2), dtype=np.uint8); img2ch[..., 1] = np.where(b, 255, 0)
want = oracle.sdf_pipeline_openmp(img2ch, spread=12, asymmetric=False, channel=1)
got = np.asarray(pallas_edt.fused_sdf_bytes(jnp.asarray(b), 12))
diff = (got.astype(int) - want.astype(int))
print("pallas-vs-oracle maxdiff:", np.abs(diff).max(), "count:", (diff != 0).sum())

# golden sample
img = oracle.load_image_gray_alpha('/root/reference/image/sample_input.png')
from PIL import Image
golden = np.asarray(Image.open('/root/reference/image/sample_output.png'))
bb = oracle.img_to_bool(img, channel=0)
got2 = np.asarray(pallas_edt.fused_sdf_bytes(jnp.asarray(bb), 100, asymmetric=True))
print("golden maxdiff:", np.abs(got2.astype(int) - golden.astype(int)).max())

# XLA scan path on chip too
got3 = np.asarray(hard_sdf_exact_from_bool(jnp.asarray(bb), 100, asymmetric=True, use_pallas=False))
print("xla-path golden maxdiff:", np.abs(got3.astype(int) - golden.astype(int)).max())

# timing: 4K x 4K, spread 64
N = 4096
b4k = jnp.asarray(rng.random((N, N)) < 0.3)
f = jax.jit(lambda x: pallas_edt.fused_sdf_bytes(x, 64))
out = f(b4k); out.block_until_ready()
ts = []
for _ in range(5):
    t0 = time.perf_counter(); f(b4k).block_until_ready(); ts.append(time.perf_counter() - t0)
dt = min(ts)
print(f"fused 4K spread=64: {dt*1e3:.2f} ms -> {N*N/dt/1e9:.3f} Gpix/s")

# round-4 paths: large-spread looped kernel, exact full-range distance,
# fused-mm soft (all small-shape, parity-focused)
bs = rng.random((256, 250)) < 0.02
inside = oracle.felzenszwalb_edt_2d(oracle.bool_to_indicator(bs, True))
outside = oracle.felzenszwalb_edt_2d(oracle.bool_to_indicator(bs, False))
want_ls = oracle.float_to_byte(oracle.signed_merge(outside, inside), 1024, False)
got_ls = np.asarray(pallas_edt.fused_sdf_bytes(jnp.asarray(bs), 1024))
print("looped -s1024 maxdiff:", np.abs(got_ls.astype(int) - want_ls.astype(int)).max())

seeds = rng.random((200, 130)) < 0.01
d = np.asarray(pallas_edt.exact_distance_field(jnp.asarray(seeds)))
ys, xs = np.nonzero(seeds)
yy, xx = np.mgrid[0:200, 0:130]
d2ref = np.min(
    (yy[..., None] - ys[None, None]) ** 2 + (xx[..., None] - xs[None, None]) ** 2,
    axis=-1,
)
print("exact-distance maxerr:", np.abs(d - np.sqrt(d2ref)).max())

from chaq_sdfgen_tpu.ops import pallas_soft_mm as PM
from chaq_sdfgen_tpu.ops import softsdf
gray = jnp.asarray((rng.random((256, 256)) * 255).astype(np.float32))
f_mm = np.asarray(PM.soft_field_mm_fused(gray, 16, 2.0, 1.0, 1e-6))
import os
os.environ["CHAQ_SOFT_FUSED"] = "0"
f_ref = np.asarray(softsdf.soft_sdf_field(gray, 14, tau=2.0, temperature=1.0))
os.environ.pop("CHAQ_SOFT_FUSED")
print("fused-mm soft maxerr:", np.abs(f_mm - f_ref).max())

import os as _os_exit; _os_exit._exit(0)  # skip the axon plugin teardown hang
