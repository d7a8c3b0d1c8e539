"""DQ rule set: fused single-pass evaluation + enforcement policies +
quarantine routing.

Parity:
- fold semantics (``dq/DQ.scala:40-52``): overall = FAIL if any FAIL else
  WARNING if any WARNING else PASS;
- policies (``core/IngestionJob.scala:101-121``, ``docs/02-tech-spec.md:
  124-131``): FAIL_FAST raises, LOG_ONLY continues, QUARANTINE routes
  failing rows aside (real here; stubbed log-only in the reference,
  ``IngestionJob.scala:110-113``).

Scale design: all fusable checks execute in ONE ``df.agg`` job (map-side
partial aggregation, no shuffle); non-fusable checks (referential
integrity) run as separate broadcast anti-joins. Quarantine split reuses
each check's ``violation_predicate`` so good/bad routing is two filtered
writes off one scan (or one pass with ``df.persist`` upstream).
"""

from __future__ import annotations

import enum
import logging
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lakehouse_ingestion_spark.dq.checks import DQCheck
from lakehouse_ingestion_spark.dq.model import DQResult, DQStatus, DQSummary
from lakehouse_ingestion_spark.errors import DataQualityError

log = logging.getLogger(__name__)


class OnFailPolicy(enum.Enum):
    FAIL_FAST = "FAIL_FAST"
    QUARANTINE = "QUARANTINE"
    LOG_ONLY = "LOG_ONLY"


@dataclass
class DQRuleSet:
    checks: list[DQCheck] = field(default_factory=list)

    def apply(self, df: DataFrame) -> DQSummary:
        """Evaluate all checks. Fusable checks share a single agg pass."""
        results: list[DQResult] = []
        fused: list[DQCheck] = []
        for check in self.checks:
            missing = [c for c in check.required_columns() if c not in df.columns]
            if missing:
                results.append(
                    DQResult(check.name, DQStatus.FAIL, {}, f"missing columns: {missing}")
                )
                continue
            try:
                check.agg_exprs()  # probe fusability
                fused.append(check)
            except NotImplementedError:
                results.append(check.run(df))
        if fused:
            exprs = [e for c in fused for e in c.agg_exprs()]
            row = df.agg(*exprs).collect()[0].asDict()
            results.extend(c.evaluate(row) for c in fused)
        return DQSummary.fold(results)

    # -- quarantine ---------------------------------------------------------
    def violation_column(self, df: DataFrame | None = None) -> "F.Column":
        """Array column of names of checks the row violates (empty = clean).
        Only row-expressible checks participate; when ``df`` is given,
        checks whose required columns are missing are skipped (their
        predicate could never resolve — apply() already reports them as
        FAIL, but the quarantine split must not crash on them)."""
        pairs = []
        for check in self.checks:
            if df is not None and any(
                c not in df.columns for c in check.required_columns()
            ):
                continue
            pred = check.violation_predicate()
            if pred is not None:
                pairs.append(F.when(pred, F.lit(check.name)))
        if not pairs:
            return F.array().cast("array<string>")
        return F.array_compact(F.array(*pairs))

    def split(self, df: DataFrame) -> tuple[DataFrame, DataFrame]:
        """(good, bad) — bad rows carry ``_dq_failures: array<string>``.
        SURVEY.md D14 quarantine routing."""
        tagged = df.withColumn("_dq_failures", self.violation_column(df))
        good = tagged.filter(F.size("_dq_failures") == 0).drop("_dq_failures")
        bad = tagged.filter(F.size("_dq_failures") > 0)
        return good, bad

    # -- enforcement --------------------------------------------------------
    def enforce(
        self,
        df: DataFrame,
        policy: OnFailPolicy = OnFailPolicy.LOG_ONLY,
        quarantine_writer=None,
    ) -> tuple[DataFrame, DQSummary]:
        """Run checks and apply the policy. Returns (rows to continue with,
        summary). ``quarantine_writer: DataFrame -> None`` persists bad rows
        under the QUARANTINE policy."""
        summary = self.apply(df)
        if summary.status is not DQStatus.FAIL:
            if summary.status is DQStatus.WARNING:
                for r in summary.warned:
                    log.warning("DQ WARNING %s: %s", r.check_name, r.message)
            return df, summary

        if policy is OnFailPolicy.FAIL_FAST:
            raise DataQualityError(
                f"DQ failed: {[r.check_name for r in summary.failed]}", summary
            )
        if policy is OnFailPolicy.QUARANTINE:
            good, bad = self.split(df)
            if quarantine_writer is not None:
                quarantine_writer(bad)
            else:
                log.warning("QUARANTINE policy with no writer; dropping bad rows")
            return good, summary
        for r in summary.failed:
            log.warning("DQ FAIL (LOG_ONLY) %s: %s", r.check_name, r.message)
        return df, summary

    def metrics_df(self, df: DataFrame) -> DataFrame:
        """One-row DataFrame of all fused check metrics — lets callers embed
        DQ into a pipeline plan (or ``DataFrame.observe``) without a
        separate collect."""
        exprs = []
        for c in self.checks:
            try:
                exprs.extend(c.agg_exprs())
            except NotImplementedError:
                pass
        if not exprs:
            return df.agg(F.count(F.lit(1)).alias("total_rows"))
        return df.agg(*exprs)
