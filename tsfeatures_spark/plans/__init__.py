from .lineage import ResumableRollupJob, bootstrap_tokens  # noqa: F401
