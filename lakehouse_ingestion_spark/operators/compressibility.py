"""Compression-ratio quality signal (Gopher/Dolma-style).

zlib-compressed size over raw size is a cheap, language-agnostic
redundancy proxy: boilerplate, templated spam, and keyword stuffing
compress far below natural prose. MassiveText (Gopher) and Dolma both
gate documents on it alongside the lexical repetition rules
(``operators/repetition.py`` — which this complements: repetition
signals see token-level structure, compressibility sees sub-token and
long-range redundancy).

Execution shape: ``mapInArrow`` — one Python worker pass, batch-at-a-
time. The per-document ``zlib.compress`` is C code; the Python loop
only iterates documents (not bytes/tokens), so throughput is dominated
by zlib itself (~100 MB/s/core — at 100 TB this is an embarrassingly
parallel scan, no shuffle, and the natural place to fuse other
per-doc Python-only signals). There is NO DuckDB-oracle row for this
operator: SQL has no zlib — the contract is pinned by unit tests
against Python's zlib directly.

Determinism: zlib output bytes can vary across zlib builds/levels, but
the LENGTH of the compressed stream at a fixed level is stable for a
fixed input on a given zlib — and the signal is the ratio, which
downstream thresholds treat as approximate anyway. Tests assert exact
equality against the same interpreter's zlib, plus semantic bounds.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType


def compression_ratio(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "compress_ratio",
    level: int = 6,
) -> DataFrame:
    """Add ``out_col``: len(zlib(text, level)) / len(utf8(text)).

    Natural prose lands ~0.3-0.6; heavy boilerplate well under 0.2;
    empty documents get NULL (length rules own them). Ratios can exceed
    1.0 for tiny documents (zlib framing overhead) — callers threshold
    on a minimum length first.
    """
    if not -1 <= level <= 9:
        raise ValueError(f"zlib level must be in [-1, 9], got {level}")

    def _batches(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in it:
            col = batch.column(batch.schema.get_field_index(text_col))
            ratios = []
            for v in col:
                s = v.as_py()
                if s is None or len(s) == 0:
                    ratios.append(None)
                    continue
                raw = s.encode("utf-8")
                ratios.append(len(zlib.compress(raw, level)) / len(raw))
            yield batch.append_column(
                out_col, pa.array(ratios, type=pa.float64())
            )

    # fresh StructType — StructType.add MUTATES the DataFrame's cached
    # schema object in place, which corrupts df.columns
    result_schema = StructType(
        list(df.schema.fields) + [StructField(out_col, DoubleType())]
    )
    return df.mapInArrow(_batches, result_schema)


def compressibility_filter(
    df: DataFrame,
    min_ratio: float = 0.15,
    text_col: str = "text",
    min_chars: int = 64,
    keep_col: str = "keep_compress",
) -> DataFrame:
    """Mark documents whose compression ratio falls below ``min_ratio``
    (extreme redundancy) — marking, not filtering, per the curation
    report-first contract. Documents shorter than ``min_chars`` pass
    unconditionally (framing overhead makes their ratios meaningless).
    """
    scored = compression_ratio(df, text_col)
    short = F.length(F.col(text_col)) < min_chars
    return scored.withColumn(
        keep_col,
        short | F.col("compress_ratio").isNull()
        | (F.col("compress_ratio") >= min_ratio),
    )
