from . import jsonl  # noqa: F401  (registers queries on import)
