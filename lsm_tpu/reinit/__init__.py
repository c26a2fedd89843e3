from .eikonal import reinitialize, reinit_rhs
from .velocity_extension import extend_along_normals
