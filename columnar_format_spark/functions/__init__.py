from . import text, dedup, similarity, python_udfs  # noqa: F401  (registers queries)
