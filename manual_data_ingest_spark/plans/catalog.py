"""Imports every operator module so its @register calls run.

Add new operator modules here as they are implemented (SURVEY.md §7 phases).
"""

# Phase 0
import manual_data_ingest_spark.plans.flagship  # noqa: F401
