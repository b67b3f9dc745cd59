from . import vector_store  # noqa: F401
