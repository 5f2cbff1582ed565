from . import text, dedup, similarity, python_udfs, multimodal  # noqa: F401  (registers queries)
