#!/usr/bin/env python
"""Adversarial viral-band-key probe for the posting-capped incremental
near-dup index (round-7 verdict #5).

Injects a viral cluster — N near-identical template documents (shared
boilerplate body + one unique tail token each) — into the sf documents
corpus, splits 20% of it into the arriving batch, and runs
``incremental_near_dup`` at the registry geometry (8 hashes / 4 bands /
threshold 0.3) twice: uncapped and with ``posting_cap``. Reports:

- uncapped / capped verified-pair counts and wall times,
- **organic recall**: capped must retain EVERY uncapped pair not
  involving an injected doc (their band keys are untouched by the cap),
- overall recall (the viral cluster's O(hot²) pairs are dropped BY
  DESIGN — that candidate volume is what the cap guards against),
- the dropped-keys / dropped-postings metrics the operator emits.

Usage: python tools/skew_probe.py [SF_DIR] [N_VIRAL] [CAP]
Defaults: /tmp/sf10 2000 64
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
    n_viral = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    cap = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    from pyspark.sql import functions as F

    from lakehouse_ingestion_spark.operators.incremental_dedup import (
        MinHashIndexFrames,
        incremental_near_dup,
        minhash_index,
    )
    from lakehouse_ingestion_spark.session import SparkConfig, get_spark

    spark = get_spark(SparkConfig(app_name="skew-probe"))
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    max_id = docs.agg(F.max("doc_id")).first()[0]

    template = (
        "subscribe to our newsletter for weekly updates terms of service "
        "privacy policy cookie settings all rights reserved contact us "
        "about careers press blog help center community guidelines "
        "follow us on social media download our mobile application today"
    )
    viral = spark.range(n_viral).select(
        (F.col("id") + max_id + 1).alias("doc_id"),
        F.concat(
            F.lit(template + " item"), F.col("id").cast("string")
        ).alias("text"),
    )
    corpus = docs.unionByName(viral)
    batch = corpus.where(F.col("doc_id") % 5 == 0)
    hist = corpus.where(F.col("doc_id") % 5 != 0)

    # ingest-time artifact: persist the history index once (both runs read it)
    idx_path = "/tmp/skew_probe_idx"
    idx = minhash_index(hist, num_hashes=8, num_bands=4, seed=42)
    idx.bands.write.mode("overwrite").parquet(f"{idx_path}/bands")
    idx.hashes.write.mode("overwrite").parquet(f"{idx_path}/hashes")
    stored = MinHashIndexFrames(
        bands=spark.read.parquet(f"{idx_path}/bands"),
        hashes=spark.read.parquet(f"{idx_path}/hashes"),
    )

    def run(posting_cap):
        metrics = []
        t0 = time.perf_counter()
        pairs, _ = incremental_near_dup(
            batch,
            stored,
            0.3,
            num_hashes=8,
            num_bands=4,
            posting_cap=posting_cap,
            on_cap_metric=metrics.append if posting_cap else None,
        )
        got = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
        return got, time.perf_counter() - t0, {m.name: m.value for m in metrics}

    uncapped, t_un, _ = run(None)
    capped, t_cap, m = run(cap)

    organic_un = {
        p for p in uncapped if p[0] <= max_id and p[1] <= max_id
    }
    organic_cap = {
        p for p in capped if p[0] <= max_id and p[1] <= max_id
    }
    missing = organic_un - organic_cap
    print(f"sf_dir={sf_dir} n_viral={n_viral} cap={cap} geometry=8h/4b t=0.3")
    print(f"uncapped pairs={len(uncapped)} wall={t_un:.1f}s")
    print(f"capped   pairs={len(capped)} wall={t_cap:.1f}s")
    print(
        f"organic pairs: uncapped={len(organic_un)} capped={len(organic_cap)}"
        f" missing={len(missing)} recall={1 - len(missing) / max(1, len(organic_un)):.4f}"
    )
    print(
        f"overall recall={len(capped & uncapped) / max(1, len(uncapped)):.4f}"
        " (viral-cluster pairs dropped by design)"
    )
    print(
        f"capped_keys={m.get('incr_near_dup_capped_keys')}"
        f" capped_postings={m.get('incr_near_dup_capped_postings')}"
    )

    # A dropped ORGANIC pair is legitimate ONLY when the cluster it
    # belongs to is itself over-shared: every band key the pair shares
    # must be hot. Verify the structural guarantee on a sample — any
    # missing pair with an under-cap shared key is a real recall bug.
    if missing:
        sample = sorted(missing)[:: max(1, len(missing) // 200)][:200]
        hot_keys = {
            (r["band"], r["key"])
            for r in __import__(
                "lakehouse_ingestion_spark.operators.incremental_dedup",
                fromlist=["hot_posting_keys"],
            ).hot_posting_keys(
                stored.bands.select("band", "key").unionByName(
                    minhash_index(
                        batch, num_hashes=8, num_bands=4, seed=42
                    ).bands.select("band", "key")
                ),
                cap,
            ).collect()
        }
        ids = {d for pair in sample for d in pair}
        doc_bands = {}
        band_rows = (
            minhash_index(
                corpus.where(F.col("doc_id").isin(list(ids))),
                num_hashes=8,
                num_bands=4,
                seed=42,
            )
            .bands.collect()
        )
        for r in band_rows:
            doc_bands.setdefault(r["doc_id"], set()).add((r["band"], r["key"]))
        bugs = []
        for a, b in sample:
            shared = doc_bands.get(a, set()) & doc_bands.get(b, set())
            if shared and not shared <= hot_keys:
                bugs.append((a, b, sorted(shared - hot_keys)[:2]))
        print(
            f"dropped-pair audit: {len(sample)} sampled, "
            f"{len(bugs)} with an under-cap shared key (must be 0)"
        )
        if bugs:
            print("RECALL VIOLATION", bugs[:5])
            sys.exit(1)
    spark.stop()


if __name__ == "__main__":
    main()
