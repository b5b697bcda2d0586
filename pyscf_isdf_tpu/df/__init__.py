from pyscf_isdf_tpu.df import fftdf  # noqa: F401
