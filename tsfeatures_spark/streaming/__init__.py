from .incremental import apply_retention, incremental_rollup, last_processed_snapshot, new_docs_since  # noqa: F401
