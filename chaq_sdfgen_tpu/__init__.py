"""chaq_sdfgen_tpu — TPU-native differentiable signed-distance-field framework.

A from-scratch JAX/XLA/Pallas re-design of chaquator/chaq-sdfgen's
capabilities (see SURVEY.md): exact banded EDT (OpenMP-binary parity),
truncated spread-radius search (OpenCL-kernel parity), jump-flood scale-out,
a differentiable soft path, and multi-chip sharding over a device mesh.
"""

from chaq_sdfgen_tpu.config import Algorithm, Channel, SdfConfig, ShardingConfig, SoftConfig
from chaq_sdfgen_tpu.models.sdf_model import (
    SDFGenerator,
    hard_sdf_brute,
    hard_sdf_exact,
    hard_sdf_exact_from_bool,
    hard_sdf_jfa,
)

__version__ = "0.1.0"

__all__ = [
    "Algorithm",
    "Channel",
    "SdfConfig",
    "ShardingConfig",
    "SoftConfig",
    "SDFGenerator",
    "hard_sdf_exact",
    "hard_sdf_exact_from_bool",
    "hard_sdf_brute",
    "hard_sdf_jfa",
    "__version__",
]
