from pyscf_isdf_tpu.parallel.mesh import grid_mesh, GRID_AXIS  # noqa: F401
