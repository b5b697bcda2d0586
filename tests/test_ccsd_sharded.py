"""SPMD CCSD (GSPMD-partitioned update) == single-device kernel.

The mpicc analog (reference pyscf/pbc/mpicc): same einsum program,
integral blocks and t2 sharded over the trailing virtual axis of an
8-virtual-device mesh, collectives inserted by XLA.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pyscf_isdf_tpu import build_cell
from pyscf_isdf_tpu.scf import build_scf_system, scf_kernel
from pyscf_isdf_tpu.cc import gccsd
from pyscf_isdf_tpu.df import fft_ao2mo


def test_sharded_ccsd_matches_single():
    assert len(jax.devices()) >= 8, "needs the 8-virtual-device conftest"
    from pyscf_isdf_tpu.models import diamond_primitive

    cell = diamond_primitive(mesh=(14, 14, 14))   # nv_so = 8: full mesh
    system = build_scf_system(cell)
    res = scf_kernel(system, xc=None, exxdiv=None, conv_tol=1e-12)

    mo_e = np.asarray(res["mo_energy"])
    mo_c = np.asarray(res["mo_coeff"])
    nmo = mo_c.shape[1]
    moR = system.aoR @ jnp.asarray(mo_c)
    eri_mo = np.asarray(fft_ao2mo.general(
        moR, moR, moR, moR, jnp.asarray(system.coulG), system.mesh,
        system.weight)).reshape(nmo, nmo, nmo, nmo)
    _, eri_so = gccsd.spinorb_from_spatial(np.diag(mo_e), eri_mo)
    f_so = np.diag(np.repeat(mo_e, 2))
    no = system.nelec

    out1 = gccsd.kernel(f_so, eri_so, no, conv_tol=1e-11)
    out8 = gccsd.kernel_sharded(f_so, eri_so, no, conv_tol=1e-11)
    assert out1["converged"] and out8["converged"]
    assert abs(out1["e_corr"] - out8["e_corr"]) < 1e-11
    # t2 really lives sharded on the mesh
    shards = out8["t2"].sharding
    assert len(shards.device_set) == 8
