"""Text-analysis functions for training-data pipelines.

All pure Column expressions (JVM-side, whole-stage codegen — no Python
UDFs): token counting, quality scoring, language-ID heuristics, document
fingerprinting. Designed so a DuckDB oracle can replicate each via ANSI
SQL (md5 for fingerprints, regexp counts for token stats).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_WS = r"\s+"

# tiny marker-word lists for the n-gram/stopword language heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "los"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
}


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization (Java ``\\s+`` = ``[ \\t\\n\\x0b\\f\\r]+``);
    never emits empty tokens.  Splitting on ``\\s+`` leaves '' elements
    at leading/trailing whitespace boundaries (and F.trim strips only
    SPACES, so a leading tab survived it) — the filter removes them, so
    empty / whitespace-only / padded text all yield exactly the real
    words, matching the oracle-side explicit-class + non-empty-filter
    pattern (r12 parity fix at source; was a latent '' word in the
    histogram for non-space-padded text)."""
    return F.filter(F.split(_col(text), _WS), lambda t: F.length(t) > 0)


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text)).cast("long")


def word_match_count(text: Column | str, words: list[str]) -> Column:
    """Number of tokens that are in ``words`` (case-insensitive)."""
    lowered = [w.lower() for w in words]
    arr = tokens(F.lower(_col(text)))
    return F.size(F.filter(arr, lambda t: t.isin(lowered))).cast("long")


def quality_score(
    text: Column | str,
    min_tokens: int = 10,
    max_tokens: int = 100_000,
    stopwords: list[str] | None = None,
) -> Column:
    """Heuristic document quality in [0, 1]: combines length sanity,
    alphabetic ratio, mean token length sanity, and stopword presence
    (C4/Gopher-style rule-of-thumb filters, as pure SQL expressions)."""
    t = _col(text)
    n_tok = token_count(t)
    n_chars = F.length(t)
    alpha_chars = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    alpha_ratio = F.when(n_chars > 0, alpha_chars / n_chars).otherwise(F.lit(0.0))
    mean_tok_len = F.when(n_tok > 0, n_chars / n_tok).otherwise(F.lit(0.0))
    sw = stopwords if stopwords is not None else LANG_MARKERS["en"]
    sw_ratio = F.when(n_tok > 0, word_match_count(t, sw) / n_tok).otherwise(F.lit(0.0))

    len_ok = ((n_tok >= min_tokens) & (n_tok <= max_tokens)).cast("double")
    tok_len_ok = ((mean_tok_len >= 2.0) & (mean_tok_len <= 12.0)).cast("double")
    sw_ok = (sw_ratio > 0.0).cast("double")
    score = (
        F.lit(0.25) * len_ok
        + F.lit(0.25) * tok_len_ok
        + F.lit(0.25) * F.least(alpha_ratio * 1.25, F.lit(1.0))
        + F.lit(0.25) * sw_ok
    )
    return F.round(score, 6)


# BPE-ish pre-tokenizer: contractions, space-prefixed letter runs, digit
# runs, punctuation runs. Deliberately lookahead-free so the same pattern
# runs on Java regex (Spark) and RE2 (DuckDB oracle); whitespace is the
# EXPLICIT Java-\s class (r12 parity sweep: RE2's \s lacks \x0B, so a
# bare \s would diverge on vertical-tab-adjacent punctuation).
BPE_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^ \t\n\x0b\f\rA-Za-z0-9]+"
)

ROLLING_P = 2_147_483_647  # 2^31 - 1; keeps h*31 + c inside int64


def bpe_token_count(text: Column | str, pattern: str = BPE_PATTERN) -> Column:
    """Approximate BPE token count: matches of a GPT-2-style pre-tokenizer
    regex (the real BPE merge step only splits within pre-tokens, so this
    upper-bounds and strongly correlates with true token counts)."""
    return F.size(F.regexp_extract_all(_col(text), F.lit(pattern), 0)).cast("long")


def fingerprint_rolling(text: Column | str, normalize: bool = True) -> Column:
    """Polynomial (Rabin-Karp-style) rolling hash of the normalized text:
    fold h = (h*31 + codepoint) mod (2^31 - 1) over characters. Pure
    higher-order-function fold — JVM-side, cross-engine reproducible."""
    t = _col(text)
    if normalize:
        t = F.regexp_replace(F.lower(F.trim(t)), _WS, " ")
    codes = F.transform(
        F.regexp_extract_all(t, F.lit(r"."), 0), lambda c: F.ascii(c).cast("long")
    )
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * F.lit(31) + c) % ROLLING_P,
    )


def fingerprint_md5(text: Column | str, normalize: bool = True) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text
    (lower, collapse whitespace). Cross-engine stable (DuckDB md5 ==
    Spark md5) so exact-dup detection is oracle-checkable."""
    t = _col(text)
    if normalize:
        t = F.regexp_replace(F.lower(F.trim(t)), _WS, " ")
    return F.md5(t)


def fingerprint_xxhash(text: Column | str, normalize: bool = True) -> Column:
    """Production-default fingerprint: xxhash64 of the normalized text.

    ~3x cheaper than md5 inside whole-stage codegen (non-cryptographic,
    8-byte output vs 16-byte hex string — the sf10 hash-scan rows
    ``dedup_exact``/``fingerprint``/``dedup_latest`` are md5-bound, see
    BASELINE.md) at ~n²/2⁶⁵ collision odds — fine for dedup grouping,
    not for content addressing. md5 stays the cross-engine oracle
    variant (DuckDB has no xxhash64)."""
    t = _col(text)
    if normalize:
        t = F.regexp_replace(F.lower(F.trim(t)), _WS, " ")
    return F.xxhash64(t)


#: dispatch for operators exposing a ``hash_fn=`` parameter
FINGERPRINT_FNS = {
    "xxhash64": fingerprint_xxhash,
    "md5": fingerprint_md5,
    "rolling": fingerprint_rolling,
}


def language_scores(text: Column | str, markers: dict[str, list[str]] | None = None) -> Column:
    """Map<lang, marker-hit-count> for the language heuristic."""
    m = markers or LANG_MARKERS
    pairs = []
    for lang, words in m.items():
        pairs.extend([F.lit(lang), word_match_count(text, words)])
    return F.create_map(*pairs)


def language_id(text: Column | str, markers: dict[str, list[str]] | None = None) -> Column:
    """Argmax language by marker-word hits; 'und' (undetermined) when no
    marker hits. Deterministic tie-break: lexicographically smallest
    lang among the argmax set."""
    m = markers or LANG_MARKERS
    counts = [(lang, word_match_count(text, words)) for lang, words in sorted(m.items())]
    best = F.greatest(*[c for _, c in counts]) if len(counts) > 1 else counts[0][1]
    expr = F.lit("und")
    # first lang (sorted) achieving the max wins; build right-to-left
    for lang, c in reversed(counts):
        expr = F.when((c == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# (name, pattern, replacement) applied IN ORDER — email first so its
# digits can't be half-eaten by the number rule, IPv4 before bare number
# runs. Patterns restricted to syntax Java regex and RE2 (DuckDB) parse
# identically, so redaction is oracle-checkable.
PII_RULES: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("number", r"\d{7,}", "<NUM>"),
]


def redact_pii(
    text: Column | str, rules: list[tuple[str, str, str]] | None = None
) -> Column:
    """Replace PII spans with typed placeholders — chained
    ``regexp_replace`` (JVM, codegen; one pass per rule). The scrub every
    web-scale training corpus runs before tokenization."""
    out = _col(text)
    for _, pattern, repl in rules or PII_RULES:
        out = F.regexp_replace(out, pattern, repl)
    return out


def pii_counts(
    text: Column | str, rules: list[tuple[str, str, str]] | None = None
) -> Column:
    """Map<rule-name, match-count> for audit metrics. Counts overlap-free
    matches per rule on the ORIGINAL text (rules are independent here,
    unlike the ordered redaction)."""
    pairs = []
    for name, pattern, _ in rules or PII_RULES:
        pairs.extend([F.lit(name), F.regexp_count(_col(text), F.lit(pattern))])
    return F.create_map(*pairs)
