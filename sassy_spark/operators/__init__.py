from . import search, linkage, cluster  # noqa: F401
