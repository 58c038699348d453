from . import geo, portable, text  # noqa: F401
