"""Iceberg-style lakehouse layer for pre-tokenized training sequences.

The table format is implemented from scratch (no Iceberg runtime jar):
parquet data files + a metadata directory of immutable snapshot JSONs,
per-snapshot manifest parquet (per-file partition value, row count,
bytes, per-column min/max stats), and an atomically-swapped VERSION
pointer. Replaces the reference's SourceRegistry/SourceDefinition
catalog (config/ConfigLoader.scala:40-88, config/Models.scala:64-75)
with a snapshot-isolated table catalog.
"""

from .metadata import MANIFEST_SCHEMA, TOKEN_SCHEMA, SnapshotConflict, TokenTable
from .equivalence import scan_fingerprint, assert_scan_equivalent
from .generator import token_dataframe, write_token_table

__all__ = [
    "MANIFEST_SCHEMA",
    "TOKEN_SCHEMA",
    "SnapshotConflict",
    "TokenTable",
    "scan_fingerprint",
    "assert_scan_equivalent",
    "token_dataframe",
    "write_token_table",
]
