from .io import read_pages, read_queries, read_table, pages_from_documents  # noqa: F401
