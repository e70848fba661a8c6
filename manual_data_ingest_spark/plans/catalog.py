"""Imports every operator module so its @register calls run.

Add new operator modules here as they are implemented (SURVEY.md §7 phases).
"""

# Phase 0
import manual_data_ingest_spark.plans.flagship  # noqa: F401

# Phase 1 — relational core
import manual_data_ingest_spark.operators.filters  # noqa: F401
import manual_data_ingest_spark.operators.joins  # noqa: F401
import manual_data_ingest_spark.operators.aggregates  # noqa: F401
import manual_data_ingest_spark.operators.sorts  # noqa: F401
import manual_data_ingest_spark.operators.setops  # noqa: F401

# Phase 2 — windows + scalar/array/map/JSON functions
import manual_data_ingest_spark.operators.windows  # noqa: F401
import manual_data_ingest_spark.functions.scalar  # noqa: F401
import manual_data_ingest_spark.functions.nested  # noqa: F401

# Phase 3 — sources/sinks, ingest/metadata ops, UDF surface
import manual_data_ingest_spark.sources.scans  # noqa: F401
import manual_data_ingest_spark.operators.ingest  # noqa: F401
import manual_data_ingest_spark.operators.udfs  # noqa: F401
import manual_data_ingest_spark.operators.reshape  # noqa: F401

# Phase 4 — LLM-data-pipeline operators
import manual_data_ingest_spark.operators.dedup  # noqa: F401
import manual_data_ingest_spark.operators.similarity  # noqa: F401
import manual_data_ingest_spark.functions.text  # noqa: F401
import manual_data_ingest_spark.operators.multimodal  # noqa: F401

# Iterative graph algorithms + distributed ML primitives
import manual_data_ingest_spark.operators.graph  # noqa: F401
import manual_data_ingest_spark.operators.ml  # noqa: F401

# Phase 5 — structured streaming
import manual_data_ingest_spark.streaming.ops  # noqa: F401

# r1 capstone — end-to-end composite pipelines
import manual_data_ingest_spark.plans.pipelines  # noqa: F401

# r2 — the 11 shapes completing the TPC-H-style 22-query suite
import manual_data_ingest_spark.plans.tpch_suite  # noqa: F401
