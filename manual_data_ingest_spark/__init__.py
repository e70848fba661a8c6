"""manual_data_ingest_spark — a PySpark-native analytics/ETL engine.

Re-expresses the query and data-processing capabilities of the reference
repo ``hubmapconsortium/manual-data-ingest`` (curator-operated metadata
ingest/registration ETL — see SURVEY.md §0 for availability notes and the
public-knowledge reconstruction policy) as an idiomatic Spark DataFrame
library, plus the LLM-data-pipeline operators (dedup, similarity search,
multimodal columns, text analysis) the north star mandates.

Architecture (SURVEY.md §4): no custom Catalyst rules — the engine is a
library of declarative DataFrame transformations whose physical execution
(pushdown, pruning, join selection, AQE, codegen) is delegated to Catalyst.
"""

from manual_data_ingest_spark.session import get_spark
from manual_data_ingest_spark.io import load_table, load_events, TABLES

__all__ = ["get_spark", "load_table", "load_events", "TABLES"]
__version__ = "0.1.0"
