from . import text, dedup, similarity, python_udfs, multimodal, quality  # noqa: F401  (registers queries)
