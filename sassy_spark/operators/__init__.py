from . import (  # noqa: F401
    cluster,
    dedup,
    events,
    linkage,
    multimodal,
    search,
    similarity,
    staging,
    textstats,
)
