from . import text, dedup, similarity, python_udfs, multimodal, quality, pipeline_ops  # noqa: F401  (registers queries)
