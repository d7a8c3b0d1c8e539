"""Byte-pair-encoding tokenizer TRAINING and encoding, Spark-first.

BPE training (Sennrich et al. ACL'16) never needs the corpus after one
pass: merges are learned from the WORD-FREQUENCY HISTOGRAM, which is
vocabulary-sized, not corpus-sized.  That asymmetry is the whole 100-TB
design:

1. ``bpe_train`` runs ONE distributed word-count aggregate over the
   corpus (map-side combined — the only corpus-sized work), prunes the
   histogram by ``min_freq``, gates the driver collect by ``max_words``
   (the ``semantic_decon.max_eval`` posture), then learns merges on the
   driver over the bounded histogram — the same shape
   sentencepiece-style trainers use.  Determinism: the best pair is
   (count DESC, pair lexicographic ASC), so equal corpora learn equal
   merge tables on any cluster layout.
2. ``bpe_encode`` broadcasts the merge ranks in an Arrow-batched
   ``mapInPandas`` closure and applies them per word with the standard
   lowest-rank-first loop; a per-batch word cache collapses repeated
   words (Zipf makes the cache hit rate high), so the per-row cost
   tracks DISTINCT words per batch.

The merge table is a plain ``list[tuple[str, str]]`` — persist it as
JSON next to the model, not in the engine; tokenizers are artifacts,
not state.

End-of-word marker: every word ends with ``</w>`` (the classic scheme),
so merges distinguish word-final from word-internal pairs and decoding
round-trips whitespace.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lakehouse_ingestion_spark.errors import ConfigError
from lakehouse_ingestion_spark.functions.text import tokens

EOW = "</w>"

# Java regex \s (what functions.text.tokens splits the TRAINING histogram
# on, JVM-side) is the ASCII set [ \t\n\x0B\f\r] — NOT Python str.split's
# Unicode whitespace (U+00A0, U+2028, ...).  The encoder must segment
# words with the SAME definition the histogram counted, or merges get
# applied to words training never saw (r10 ADVICE finding; same posture
# as the \x0B Java-vs-RE2 parity fix in functions/extraction.py).
_JAVA_WS_RE = re.compile(r"[ \t\n\x0b\f\r]+")


def word_histogram(
    df: DataFrame,
    text_col: str = "text",
    lowercase: bool = True,
    min_freq: int = 1,
) -> DataFrame:
    """(word, freq) histogram — the ONE corpus-sized pass of training."""
    col = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    return (
        df.select(F.explode(tokens(col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") >= int(min_freq))
    )


def learn_merges(
    histogram: list[tuple[str, int]], num_merges: int
) -> list[tuple[str, str]]:
    """Driver-side BPE over a (word, freq) histogram: repeatedly merge
    the most frequent adjacent symbol pair (ties break lexicographic so
    training is deterministic).  Pure function — property-tested against
    an independent reference in tests."""
    words: list[tuple[list[str], int]] = [
        (list(w) + [EOW], f) for w, f in histogram if w
    ]
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, freq in words:
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + freq
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        joined = best[0] + best[1]
        for i, (syms, freq) in enumerate(words):
            j = 0
            out: list[str] = []
            while j < len(syms):
                if (
                    j + 1 < len(syms)
                    and syms[j] == best[0]
                    and syms[j + 1] == best[1]
                ):
                    out.append(joined)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[i] = (out, freq)
    return merges


def bpe_train(
    df: DataFrame,
    num_merges: int,
    text_col: str = "text",
    lowercase: bool = True,
    min_freq: int = 1,
    max_words: int = 1_000_000,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus.

    ``min_freq`` prunes the histogram BEFORE the driver collect (rare
    words contribute negligible pair mass; pruning is how web-scale
    corpora fit the gate), and ``max_words`` bounds the collect —
    crossing it raises instead of silently shipping an unbounded
    histogram to the driver.
    """
    if num_merges < 1:
        raise ConfigError(f"num_merges must be >= 1, got {num_merges}")
    hist_df = word_histogram(
        df, text_col=text_col, lowercase=lowercase, min_freq=min_freq
    )
    rows = hist_df.limit(max_words + 1).collect()
    if len(rows) > max_words:
        raise ConfigError(
            f"word histogram exceeds max_words={max_words}; raise min_freq "
            "(rare-word pruning) or the gate"
        )
    hist = sorted((r["word"], int(r["freq"])) for r in rows)
    return learn_merges(hist, num_merges)


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges lowest-rank-first to one word (+ EOW)."""
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize ``text_col`` with a learned merge table: returns
    (id_col, out_col array<string>, n_bpe_tokens).  Arrow-batched
    ``mapInPandas``; the merge ranks ship once per task in the closure
    (merge tables are vocab-sized by construction) and a per-batch word
    cache collapses Zipf-repeated words.

    Tokenization parity: words are segmented with ``_JAVA_WS_RE`` — the
    exact Java ``\\s`` class the training histogram splits on — so every
    encoded word is a word the histogram could have counted.  Lowercase
    parity (r12, closing the r11 verdict residual): lowercasing happens
    JVM-SIDE with the SAME ``F.lower`` the training histogram uses,
    BEFORE the Arrow stage — ``str.lower()`` is never on the path, so
    Java-vs-Python case-mapping drift (Unicode-version skew, Turkish
    U+0130, conditional mappings) cannot split train/encode; pinned by
    the reconstruction property test in tests/test_bpe.py."""
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    tcol, icol = text_col, id_col

    def run(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}

        def enc(text) -> list[str]:
            if text is None:
                return []
            s = text
            out: list[str] = []
            for w in _JAVA_WS_RE.split(s):
                if not w:
                    continue
                got = cache.get(w)
                if got is None:
                    got = cache[w] = encode_word(w, ranks)
                out.extend(got)
            return out

        for pdf in pdfs:
            toks = pdf[tcol].map(enc)
            yield pd.DataFrame(
                {
                    icol: pdf[icol],
                    "bpe_tokens": toks,
                    "n_bpe_tokens": toks.map(len),
                }
            ).rename(columns={"bpe_tokens": out_col})

    id_type = df.schema[icol].dataType.simpleString()
    schema = f"`{icol}` {id_type}, `{out_col}` array<string>, `n_bpe_tokens` bigint"
    src = F.lower(F.col(tcol)) if lowercase else F.col(tcol)
    return df.select(F.col(icol), src.alias(tcol)).mapInPandas(
        run, schema=schema
    )
