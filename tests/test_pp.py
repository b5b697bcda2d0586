"""GTH pseudopotential matrix parity at random k-points.

Golden fingerprints from /root/reference/pyscf/pbc/df/test/test_fft.py
(:588-611): mixed all-electron He + pseudopotential C cell, mesh [21]^3.
"""
import numpy as np
import pytest

from pyscf_isdf_tpu import build_cell
from pyscf_isdf_tpu.ops import pp as pp_ops
from pyscf_isdf_tpu.ops.ao_eval import eval_ao_numpy
from pyscf_isdf_tpu.utils import fingerprint

GOLDEN_NUC = [
    -5.7646608099493841 + 0.19126294430138713j,
    -5.6567258309199193 + 0.86813371243952175j,
    -6.1528952645454895 + 0.09517054428060109j,
    -5.7445962879770942 + 0.24611951427601772j,
]
GOLDEN_PP = [
    -5.6240249083785869 + 0.22094834302524968j,
    -5.5387702576467603 + 1.0439333717227581j,
    -6.0530899866313366 + 0.2817289667029651j,
    -5.6011543542444446 + 0.27597306418805201j,
]


@pytest.fixture(scope="module")
def hec_cell():
    return build_cell(
        np.eye(3) * 2.5,
        "He 1. .5 .5; C .1 1.3 2.1",
        basis={"He": [[0, (2.5, 1.0)], [0, (1.0, 1.0)]], "C": "gth-szv"},
        pseudo={"C": "gth-pade"},
        mesh=[21] * 3,
        unit="Angstrom",
    )


@pytest.fixture(scope="module")
def kpts():
    np.random.seed(1)
    k = np.random.random((4, 3))
    k[3] = k[0] - k[1] + k[2]
    return k


def test_get_nuc_kpts(hec_cell, kpts):
    for i, k in enumerate(kpts):
        aoR = eval_ao_numpy(hec_cell, kpt=k)
        vnuc = pp_ops.get_nuc(hec_cell, aoR)
        assert abs(fingerprint(vnuc) - GOLDEN_NUC[i]) < 1e-8


def test_get_pp_kpts(hec_cell, kpts):
    for i, k in enumerate(kpts):
        aoR = eval_ao_numpy(hec_cell, kpt=k)
        vpp = pp_ops.get_pp(hec_cell, aoR, kpt=k)
        assert abs(fingerprint(vpp) - GOLDEN_PP[i]) < 1e-7
