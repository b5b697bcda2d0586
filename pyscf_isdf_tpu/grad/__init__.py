from pyscf_isdf_tpu.grad.rhf import rhf_gradient  # noqa: F401
