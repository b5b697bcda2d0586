from pyscf_isdf_tpu.utils.elements import ELEMENTS, charge_of  # noqa: F401
from pyscf_isdf_tpu.utils.misc import fingerprint  # noqa: F401
