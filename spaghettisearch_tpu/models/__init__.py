from .blended import BlendedRanker  # noqa: F401
