from pyscf_isdf_tpu.tdscf.rks import tda_kernel, tddft_kernel  # noqa: F401
