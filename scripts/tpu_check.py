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

import os; os._exit(0)
