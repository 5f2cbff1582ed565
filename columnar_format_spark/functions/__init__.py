from . import text, dedup, similarity  # noqa: F401  (registers queries)
