"""sdfref — pure-NumPy oracle for the reference chaq-sdfgen semantics.

This package is the *test oracle* for the TPU framework: a direct, slow,
obviously-correct transcription of the reference's OpenMP pipeline
(/root/reference/openmp/sdfgen.c, /root/reference/openmp/df.c) and of the
OpenCL kernel semantics (/root/reference/opencl/sdf.cl). It is NOT part of
the production TPU path.
"""

from sdfref.oracle import (
    felzenszwalb_edt_1d,
    felzenszwalb_edt_2d,
    img_to_bool,
    bool_to_indicator,
    signed_merge,
    float_to_byte,
    sdf_pipeline_openmp,
    sdf_pipeline_opencl,
)

__all__ = [
    "felzenszwalb_edt_1d",
    "felzenszwalb_edt_2d",
    "img_to_bool",
    "bool_to_indicator",
    "signed_merge",
    "float_to_byte",
    "sdf_pipeline_openmp",
    "sdf_pipeline_opencl",
]
