from . import stencil, relax, transfer, rhs, projection  # noqa: F401
