"""ctypes bridge to the native (C/OpenMP) host kernels.

Loads ``native/libaoeval.so`` (building it with the system compiler on
first use if needed) and exposes :func:`eval_ao_native`, the float64 AO
collocation used by the once-per-geometry hcore builds. Falls back to the
numpy evaluator transparently when no compiler/library is available.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_REPO_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
_SRC = os.path.join(_REPO_ROOT, "native", "ao_eval.c")
_LIB = os.path.join(_REPO_ROOT, "native", "libaoeval.so")

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB) and os.path.exists(_SRC):
        try:
            subprocess.run(
                ["cc", "-O3", "-fopenmp", "-shared", "-fPIC",
                 "-o", _LIB, _SRC, "-lm"],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    if not os.path.exists(_LIB):
        return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        return None
    lib.eval_ao_f64.argtypes = [
        ctypes.c_void_p, ctypes.c_int64,    # coords, ng
        ctypes.c_void_p, ctypes.c_int64,    # shtab, nsh
        ctypes.c_void_p, ctypes.c_void_p,   # exps, coeffs
        ctypes.c_void_p, ctypes.c_void_p,   # centers, rcut2
        ctypes.c_void_p, ctypes.c_int64,    # images, nimg
        ctypes.c_int64, ctypes.c_void_p,    # nao, out
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def eval_ao_native(cell, coords, images, precision: float = 1e-12):
    """(ng, nao) float64 AO values via the C kernel; None if unavailable."""
    from pyscf_isdf_tpu.ops.ao_eval import shell_rcut

    lib = _load()
    if lib is None:
        return None

    nsh = len(cell.shells)
    shtab = np.zeros((nsh, 6), dtype=np.int32)
    exps, coeffs, centers, rcut2 = [], [], [], []
    po = co = 0
    ao_loc = cell.ao_loc
    for i, sh in enumerate(cell.shells):
        np_, nc = len(sh.exps), sh.nctr
        shtab[i] = (sh.l, np_, nc, po, co, ao_loc[i])
        exps.append(sh.exps)
        coeffs.append(np.ascontiguousarray(sh.coeffs).ravel())
        centers.append(cell.coords[sh.atom])
        rcut2.append(shell_rcut(sh, precision) ** 2)
        po += np_
        co += np_ * nc

    coords = np.ascontiguousarray(coords, dtype=np.float64)
    images = np.ascontiguousarray(images, dtype=np.float64)
    exps = np.concatenate(exps)
    coeffs = np.concatenate(coeffs)
    centers = np.ascontiguousarray(np.array(centers))
    rcut2 = np.array(rcut2)
    ng = coords.shape[0]
    out = np.zeros((ng, cell.nao), dtype=np.float64)

    lib.eval_ao_f64(
        coords.ctypes.data, ng,
        shtab.ctypes.data, nsh,
        exps.ctypes.data, coeffs.ctypes.data,
        centers.ctypes.data, rcut2.ctypes.data,
        images.ctypes.data, len(images),
        cell.nao, out.ctypes.data,
    )
    return out
