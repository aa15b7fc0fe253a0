from .trace import TicToc, StageStats, Tracer  # noqa: F401
