from pyscf_isdf_tpu.cc.gccsd import ccsd, ccsd_t, kernel  # noqa: F401
from pyscf_isdf_tpu.cc.kccsd import kccsd  # noqa: F401
from pyscf_isdf_tpu.cc.kccsd_blocked import kccsd_blocked  # noqa: F401
from pyscf_isdf_tpu.cc.krccsd import krccsd  # noqa: F401
from pyscf_isdf_tpu.cc.fci import fci_ground_state  # noqa: F401
from pyscf_isdf_tpu.cc.cisd import cisd, cisd_ground_state  # noqa: F401
from pyscf_isdf_tpu.cc.adc import adc2_from_scf, ip_adc2, ea_adc2  # noqa: F401
from pyscf_isdf_tpu.cc.eom import (eom_ccsd, eom_from_scf,  # noqa: F401
                                   eom_ee_energies, eom_ee_iterative)
from pyscf_isdf_tpu.cc.density import ccsd_rdm1, fci_rdm1  # noqa: F401
