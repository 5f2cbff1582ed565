from . import relational  # noqa: F401  (registers queries on import)
