from . import (  # noqa: F401
    chunkers,
    dedup,
    enrichers,
    multimodal,
    qa,
    removal,
    similarity,
    temporal,
    text_analysis,
    text_search,
)
