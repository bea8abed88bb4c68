from .profiling import PhaseTimer, trace, MetricsLog  # noqa: F401
from .retry import retry  # noqa: F401
