"""Config-driven budget-admission sink: ``target: format: budget_admit``.

```yaml
target:
  format: budget_admit
  options:
    path: /data/budget/admitted        # epoch-partitioned output
    ledger_path: /data/budget/ledger   # (epoch, rows, batch_cost, spent_after)
    score_col: quality
    cost_col: n_tokens
    budget: 1000000000
    key_col: doc_id
```

Streaming: each micro-batch admits its best rows into whatever budget
remains (``streaming/budget.admit_epoch`` — ledger-replay-safe).
Batch: the whole frame is one epoch (``run_epoch`` option, default 0),
so backfills and streams share the same ledger and the budget holds
across both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from lakehouse_ingestion_spark.errors import ConfigError
from lakehouse_ingestion_spark.sinks.base import (
    BaseWriter,
    WriteOptions,
    register_writer,
)


def _params(opts: WriteOptions):
    o = opts.options
    for req in ("ledger_path", "score_col", "cost_col", "budget"):
        if req not in o:
            raise ConfigError(f"budget_admit target needs options.{req}")
    return dict(
        out_path=opts.target,
        ledger_path=o["ledger_path"],
        score_col=o["score_col"],
        cost_col=o["cost_col"],
        budget=int(o["budget"]),
        key_col=o.get("key_col", "doc_id"),
        cum_col=o.get("cum_col", "cum_cost"),
    )


@register_writer("budget_admit")
class BudgetAdmitWriter(BaseWriter):
    aliases = ["token_budget"]

    def write_batch(self, df: DataFrame, opts: WriteOptions) -> None:
        from lakehouse_ingestion_spark.streaming.budget import admit_epoch

        admit_epoch(
            df, int(opts.options.get("run_epoch", 0)), **_params(opts)
        )

    def write_epoch_batch(
        self, df: DataFrame, opts: WriteOptions, epoch_id: int
    ) -> None:
        """Per-micro-batch entry used by the streaming pipeline."""
        from lakehouse_ingestion_spark.streaming.budget import admit_epoch

        admit_epoch(df, epoch_id, **_params(opts))
