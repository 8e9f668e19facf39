"""Batched glyph-atlas SDF generation (BASELINE config 5).

The reference processes one image per process invocation; atlas generation
is the production-scale batch path: a (N, H, W, 2) stack of glyph images
sharded over a ('data', 'y') mesh — batch across hosts (DCN), rows across
the chips of each host (ICI halo exchange) — producing (N, H, W) uint8
SDF bitmaps with the same byte-exact semantics as the single-image CLI.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from chaq_sdfgen_tpu.config import SdfConfig
from chaq_sdfgen_tpu.ops import threshold
from chaq_sdfgen_tpu.parallel.distributed import check_mesh
from chaq_sdfgen_tpu.parallel.sharded import sharded_hard_sdf_bytes


def atlas_sdf(
    images: jnp.ndarray,
    config: SdfConfig = SdfConfig(),
    mesh: Optional[Mesh] = None,
    sharding=None,
) -> jnp.ndarray:
    """(N, H, W, 2) uint8 -> (N, H, W) uint8 SDF bitmaps.

    With a mesh: shards the batch over 'data' and rows over 'y', placing
    inputs with NamedSharding so XLA keeps every stage device-local except
    the pass-2 halo exchange. Without a mesh: single-chip batched (vmapped
    Pallas kernels).

    sharding: alternatively a config.ShardingConfig — the mesh is built
    from it (mesh and sharding are mutually exclusive)."""
    images = jnp.asarray(images)
    if sharding is not None:
        if mesh is not None:
            raise ValueError("pass either mesh or sharding, not both")
        mesh = sharding.build_mesh()
    if images.ndim != 4 or images.shape[-1] != 2:
        raise ValueError(f"expected (N, H, W, 2) gray+alpha stack, got {images.shape}")
    b = threshold.hard_threshold(
        images, channel=config.channel_offset, test_above=not config.invert
    )
    if mesh is None:
        from chaq_sdfgen_tpu.models.sdf_model import hard_sdf_exact_from_bool

        return hard_sdf_exact_from_bool(
            b, config.spread, asymmetric=config.asymmetric, band=config.effective_band
        )
    n, h, _ = b.shape
    check_mesh(mesh, n, h)
    return _atlas_sharded(b, config, mesh)


def _atlas_sharded(b, config, mesh):
    axes = dict(zip(mesh.axis_names, mesh.devices.shape))
    has_data = "data" in axes and axes["data"] > 1
    spec = P("data", "y", None) if "data" in axes else P("y", None)
    b = jax.device_put(b, NamedSharding(mesh, spec))
    return sharded_hard_sdf_bytes(
        b,
        config.spread,
        mesh,
        asymmetric=config.asymmetric,
        band=config.effective_band,
        batch_axis="data" if "data" in axes else None,
    )


def atlas_sdf_spread_sweep(
    images: jnp.ndarray,
    spreads,
    config: SdfConfig = SdfConfig(),
    band: Optional[int] = None,
) -> jnp.ndarray:
    """(N, H, W, 2) uint8 + a list of spreads -> (len(spreads), N, H, W)
    uint8: the same atlas at multiple falloff ranges (mip-style levels,
    training curricula). ALL spreads share ONE compiled kernel
    (ops.pallas_edt.fused_sdf_bytes_dynamic — byte-identical to running
    atlas_sdf per spread, one band bucket >= max(spreads) + 2); a novel
    Mosaic kernel otherwise costs ~minutes to compile per spread value."""
    from chaq_sdfgen_tpu.ops.pallas_edt import fused_sdf_bytes_dynamic

    images = jnp.asarray(images)
    if images.ndim != 4 or images.shape[-1] != 2:
        raise ValueError(f"expected (N, H, W, 2) gray+alpha stack, got {images.shape}")
    spreads = [int(s) for s in spreads]
    if band is None:
        band = -((-(max(spreads) + 2)) // 16) * 16  # round up to 16
    b = threshold.hard_threshold(
        images, channel=config.channel_offset, test_above=not config.invert
    )
    outs = [
        fused_sdf_bytes_dynamic(
            b, jnp.int32(s), band=band, asymmetric=config.asymmetric
        )
        for s in spreads
    ]
    return jnp.stack(outs)
