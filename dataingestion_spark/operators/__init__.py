from . import chunkers, dedup, enrichers, removal, similarity, text_analysis  # noqa: F401
