"""CLI runner — parity with the reference's ``IngestionRunner.main``
(``core/IngestionRunner.scala:24-74``: ``--config`` dispatch, sequential
jobs in one SparkSession) plus config/schema introspection subcommands.

Usage:
    python -m lakehouse_ingestion_spark run --config pipeline.yaml
    python -m lakehouse_ingestion_spark validate --config pipeline.yaml
    python -m lakehouse_ingestion_spark schemas --registry ./schemas_registry
"""

from __future__ import annotations

import argparse
import json
import sys

from lakehouse_ingestion_spark.config import load_config
from lakehouse_ingestion_spark.errors import ConfigError


def _cmd_run(args: argparse.Namespace) -> int:
    from lakehouse_ingestion_spark.pipeline import Pipeline
    from lakehouse_ingestion_spark.session import SparkConfig, get_spark

    config = load_config(args.config)
    spark = get_spark(SparkConfig(app_name=args.app_name))
    try:
        pipeline = Pipeline(spark, config)
        results = pipeline.run()
        for r in results:
            print(
                json.dumps(
                    {
                        "job": r.name,
                        "streaming": r.streaming,
                        "rows_written": r.rows_written,
                        "dq_status": getattr(
                            getattr(r, "dq_summary", None), "status", None
                        )
                        and r.dq_summary.status.name,
                    }
                )
            )
        if args.await_streams:
            # all streams launched non-blocking (unlike the reference,
            # which serialized on awaitTermination per job); block until
            # every registered stream finishes — falling through on the
            # FIRST termination would let spark.stop() kill the rest
            pipeline.stream_manager.await_all()
        return 0
    finally:
        if not args.keep_session:
            spark.stop()


def _cmd_validate(args: argparse.Namespace) -> int:
    try:
        config = load_config(args.config)
    except ConfigError as e:
        print(f"INVALID: {e}", file=sys.stderr)
        return 1
    print(f"OK: {len(config.jobs)} job(s), env={config.env!r}")
    return 0


def _cmd_schemas(args: argparse.Namespace) -> int:
    from lakehouse_ingestion_spark.schema_registry import SchemaRegistry

    reg = SchemaRegistry(args.registry)
    for domain, dataset in reg.list_datasets():
        versions = reg.list_versions(domain, dataset)
        print(f"{domain}/{dataset}: {', '.join(versions)}")
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="lakehouse_ingestion_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    run = sub.add_parser("run", help="run a pipeline config")
    run.add_argument("--config", required=True)
    run.add_argument("--app-name", default="lakehouse-ingestion-spark")
    run.add_argument("--await-streams", action="store_true")
    run.add_argument("--keep-session", action="store_true")
    run.set_defaults(fn=_cmd_run)

    val = sub.add_parser("validate", help="validate a pipeline config")
    val.add_argument("--config", required=True)
    val.set_defaults(fn=_cmd_validate)

    sch = sub.add_parser("schemas", help="list registry schemas")
    sch.add_argument("--registry", required=True)
    sch.set_defaults(fn=_cmd_schemas)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
