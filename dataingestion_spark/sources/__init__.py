from . import (  # noqa: F401
    api_readers,
    corpus,
    dispatch,
    docx,
    docx_writer,
    markdown,
    media_types,
    pdf,
    pdf_writer,
    tabular,
)
