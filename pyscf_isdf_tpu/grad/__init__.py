from pyscf_isdf_tpu.grad.rhf import rhf_gradient  # noqa: F401
from pyscf_isdf_tpu.grad.uhf import uhf_gradient  # noqa: F401
from pyscf_isdf_tpu.grad.khf import krhf_gradient  # noqa: F401
from pyscf_isdf_tpu.grad.kuhf import kuhf_gradient  # noqa: F401
from pyscf_isdf_tpu.grad.stress import stress_tensor  # noqa: F401
from pyscf_isdf_tpu.grad.kstress import kstress_tensor  # noqa: F401
from pyscf_isdf_tpu.grad.optimize import optimize  # noqa: F401
