from . import lineage, netex  # noqa: F401
