from . import (  # noqa: F401
    assemble,
    dedup,
    extract,
    knn,
    media,
    pip,
    raster,
    similarity,
    textstats,
    tiling,
    zones,
)
