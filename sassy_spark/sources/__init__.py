from . import pages, warc  # noqa: F401
