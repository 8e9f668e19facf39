"""Parallel layer: device-mesh helpers, shard_map pipelines with ICI halo
exchange, and multi-host (DCN) initialization."""
