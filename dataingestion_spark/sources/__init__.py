from . import api_readers, corpus, markdown, media_types, tabular  # noqa: F401
