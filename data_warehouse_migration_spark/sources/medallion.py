"""Medallion (Bronze/Silver/Gold) path layout.

The reference's zones (create_schemas.sql:9-22; storage layout
docs/technical_report.md:106-123):
- landing: row-oriented CSV as delivered
- bronze:  raw Parquet, time-partitioned ``Table/Y/M/D``
           (ds_bronze_parquet.json:15) for partition pruning
- silver:  cleansed Parquet (business names, decoded types)
- gold:    star-schema tables

Spark-first: directories of Snappy-Parquet under a root; run-date
partitioning uses Hive-style ``ingest_date=YYYY-MM-DD`` so Catalyst
prunes partitions from predicates — stronger than the reference's
positional Y/M/D folders, which need path templating to prune.
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass


@dataclass(frozen=True)
class MedallionLayout:
    root: str

    def landing(self, name: str) -> str:
        return f"{self.root}/landing/{name}"

    def bronze(self, table: str) -> str:
        return f"{self.root}/bronze/{table}"

    def silver(self, table: str) -> str:
        return f"{self.root}/silver/{table}"

    def gold(self, table: str) -> str:
        return f"{self.root}/gold/{table}"

    @staticmethod
    def run_date(date: dt.date | str | None = None) -> str:
        if date is None:
            date = dt.datetime.now(dt.timezone.utc).date()
        return str(date)
