from . import (  # noqa: F401
    blocking,
    cluster,
    dedup,
    events,
    linkage,
    multimodal,
    sampling,
    search,
    similarity,
    staging,
    strsim,
    textstats,
)
