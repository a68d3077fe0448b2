"""Query pipelines: the reference's four entry points as DataFrame DAGs
plus the driver-contract query registry (queries.py)."""
