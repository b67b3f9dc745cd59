from . import markdown  # noqa: F401
