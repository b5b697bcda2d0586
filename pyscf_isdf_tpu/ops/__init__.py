from pyscf_isdf_tpu.ops.solid_harmonics import solid_harmonics, SPH_DIM  # noqa: F401
