"""Catalog operations (reference ``catalog/CatalogAdapter.scala:11-43``).

The reference defines a trait (tableExists / createOrReplaceTable) with
only a no-op implementation. Here: a real Spark-catalog adapter plus the
same no-op for parity.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.types import StructType


class CatalogAdapter:
    def table_exists(self, identifier: str) -> bool:
        raise NotImplementedError

    def create_table_if_not_exists(
        self,
        identifier: str,
        schema: StructType,
        partition_columns: list[str] | None = None,
        properties: dict | None = None,
    ) -> None:
        raise NotImplementedError


class NoopCatalogAdapter(CatalogAdapter):
    """Parity with the reference's NoopCatalogAdapter (:30-43)."""

    def table_exists(self, identifier: str) -> bool:
        return False

    def create_table_if_not_exists(self, identifier, schema, partition_columns=None, properties=None):
        return None


class SparkCatalogAdapter(CatalogAdapter):
    def __init__(self, spark: SparkSession, table_format: str = "parquet"):
        self.spark = spark
        self.table_format = table_format

    def table_exists(self, identifier: str) -> bool:
        return self.spark.catalog.tableExists(identifier)

    def create_table_if_not_exists(
        self,
        identifier: str,
        schema: StructType,
        partition_columns: list[str] | None = None,
        properties: dict | None = None,
    ) -> None:
        if self.table_exists(identifier):
            return
        ns = identifier.rsplit(".", 1)[0] if "." in identifier else None
        if ns:
            self.spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {ns}")
        cols = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields)
        ddl = f"CREATE TABLE IF NOT EXISTS {identifier} ({cols}) USING {self.table_format}"
        if partition_columns:
            ddl += " PARTITIONED BY (" + ", ".join(f"`{c}`" for c in partition_columns) + ")"
        if properties:
            props = ", ".join(
                "'{}'='{}'".format(str(k).replace("'", "''"), str(v).replace("'", "''"))
                for k, v in properties.items()
            )
            ddl += f" TBLPROPERTIES ({props})"
        self.spark.sql(ddl)
