"""Orchestration: stage sequencing, retry policy, failure hooks —
the reference's ADF pipeline control flow (SURVEY.md §2.12) as plain
driver code."""

from data_warehouse_migration_spark.plans.pipeline import (
    PipelineResult,
    Stage,
    run_pipeline,
)

__all__ = ["Stage", "PipelineResult", "run_pipeline"]
