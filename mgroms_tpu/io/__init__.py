from .diagnostics import write_field, read_field  # noqa: F401
