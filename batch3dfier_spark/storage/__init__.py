"""Iceberg-style table layer: snapshot/manifest commits + per-tile lineage."""

from .tablefmt import IcebergishTable, LineageRow  # noqa: F401
