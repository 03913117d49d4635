from .server import SearchServer  # noqa: F401
