from lakehouse_ingestion_spark.dq.model import DQStatus, DQResult, DQSummary  # noqa: F401
from lakehouse_ingestion_spark.dq.checks import (  # noqa: F401
    DQCheck,
    DriftCheck,
    NotNullCheck,
    RangeCheck,
    RegexCheck,
    UniqueKeyCheck,
    RowCountCheck,
    SetMembershipCheck,
    FreshnessCheck,
    ReferentialIntegrityCheck,
)
from lakehouse_ingestion_spark.dq.ruleset import DQRuleSet, OnFailPolicy  # noqa: F401
from lakehouse_ingestion_spark.dq.derive import checks_from_schema  # noqa: F401
