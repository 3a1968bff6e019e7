"""sassy_spark — a PySpark-native entity-resolution / approximate
string-search engine (from-scratch graft of sassy's semantics)."""

from .session import build_spark  # noqa: F401

__version__ = "0.1.0"

from .api import Searcher  # noqa: F401,E402
