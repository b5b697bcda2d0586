from pyscf_isdf_tpu.models.systems import (  # noqa: F401
    diamond_primitive,
    diamond_cubic,
    diamond_supercell,
    graphene,
)
