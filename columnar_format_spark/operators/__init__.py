from . import relational  # noqa: F401  (registers queries on import)
from . import extended  # noqa: F401
from . import timeseries  # noqa: F401
from . import tpch  # noqa: F401
from . import quality_audit  # noqa: F401
from . import scale_ops  # noqa: F401
