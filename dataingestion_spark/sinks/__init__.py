from . import lakehouse, vector_store  # noqa: F401
