from .relax_fused import fused_relax, fits_vmem          # noqa: F401
from .stencil_tiled import residual_tiled                 # noqa: F401
from .relax_tiled import relax_compact_tiled              # noqa: F401
