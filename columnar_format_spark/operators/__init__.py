from . import relational  # noqa: F401  (registers queries on import)
from . import extended  # noqa: F401
