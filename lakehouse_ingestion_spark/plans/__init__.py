from lakehouse_ingestion_spark.plans.audit import PlanAudit, audit

__all__ = ["PlanAudit", "audit"]
