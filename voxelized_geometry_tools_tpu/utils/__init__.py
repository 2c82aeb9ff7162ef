from .profiling import PhaseTimer, force_materialize, trace  # noqa: F401
