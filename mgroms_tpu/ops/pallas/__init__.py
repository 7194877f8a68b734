from .relax_fused import fused_relax, fits_vmem  # noqa: F401
