from . import (  # noqa: F401
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
