from lakehouse_ingestion_spark.operators.audit import add_audit_columns  # noqa: F401
from lakehouse_ingestion_spark.operators.dedup import (  # noqa: F401
    dedup_by_content,
    dedup_exact,
    dedup_latest_by_key,
)
from lakehouse_ingestion_spark.operators.cdc import cdc_latest, cdc_apply  # noqa: F401
from lakehouse_ingestion_spark.operators.scd import scd2_from_history, scd1_apply, scd2_merge  # noqa: F401
from lakehouse_ingestion_spark.operators.merge import upsert  # noqa: F401
from lakehouse_ingestion_spark.operators.enrich import enrich  # noqa: F401
from lakehouse_ingestion_spark.operators.gold import aggregate, rollup, cube, denormalize  # noqa: F401
