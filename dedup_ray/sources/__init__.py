from dedup_ray.sources.pages import documents_as_pages, read_pages_parquet

__all__ = ["read_pages_parquet", "documents_as_pages"]
