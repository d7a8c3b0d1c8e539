"""Raw-crawl text extraction: HTML -> training text, as pure codegen.

Web corpora arrive as markup; the first curation step is tag stripping +
entity decode + boilerplate removal.  The heavy open-source extractors
(trafilatura, jusText) are DOM parsers — per-row Python, the slow path.
For the bulk pass this module does the 95% case entirely with JVM
``regexp_replace`` chains (whole-stage codegen, no UDF, no Arrow hop):

- ``html_to_text``: drop <script>/<style>/comment blocks, convert
  block-level tags to newlines, strip remaining tags, decode the six
  HTML entities that dominate real text, collapse whitespace.
- ``boilerplate_line_filter``: drop nav/footer-style lines (too short,
  or no terminal punctuation) with an array higher-order filter — the
  line heuristic from C4 (Raffel et al., JMLR'20 §2.2: keep lines that
  end in terminal punctuation / have >= N words).

Every pattern is RE2-compatible (no lookaround, no backreferences), so
the DuckDB oracle mirrors each step with the same regex and the outputs
compare hash-exact cross-engine.  A DOM-accurate extractor can still be
slotted in as a ``mapInPandas`` stage where fidelity beats throughput;
this chain is the 100-TB bulk path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


#: (pattern, replacement) chain shared with the oracle builder — single
#: source of truth so Spark and DuckDB run the IDENTICAL regexes.
HTML_STRIP_STEPS: list[tuple[str, str]] = [
    # script/style payloads are code, not text — drop the whole element
    (r"(?is)<script\b[^>]*>.*?</script>", " "),
    (r"(?is)<style\b[^>]*>.*?</style>", " "),
    (r"(?s)<!--.*?-->", " "),
    # block-level boundaries become newlines so paragraphs survive
    (
        r"(?i)</?(?:p|br|div|li|ul|ol|h[1-6]|tr|table|blockquote|section|article)\b[^>]*>",
        "\n",
    ),
    # any remaining tag is inline markup — a space keeps words apart
    (r"<[^>]*>", " "),
    # entity decode: the six that dominate real pages; &amp; LAST so
    # double-encoded text decodes one level per pass, as specified
    (r"&nbsp;", " "),
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&quot;", "\""),
    (r"&#39;", "'"),
    (r"&amp;", "&"),
    # whitespace normalization: horizontal runs -> one space, strip
    # spaces around newlines, cap blank runs at one empty line, and
    # strip the edges (trim() only eats spaces, not newlines).
    # \x0B is listed explicitly: Java's \s matches vertical tab but
    # RE2's (DuckDB's) does not, so every class here is spelled out
    # engine-identically to keep the hash-exact cross-engine contract.
    (r"[ \t\r\f\x0B]+", " "),
    (r" ?\n ?", "\n"),
    (r"\n{3,}", "\n\n"),
    (r"^[ \t\r\n\f\x0B]+", ""),
    (r"[ \t\r\n\f\x0B]+$", ""),
]


def html_to_text(html: Column | str) -> Column:
    """Markup -> plain text as a chain of JVM regexp_replace steps
    (HTML_STRIP_STEPS), then trimmed. Null-safe: NULL in, NULL out."""
    out = _col(html)
    for pat, rep in HTML_STRIP_STEPS:
        out = F.regexp_replace(out, pat, rep)
    return F.trim(out)


#: terminal-punctuation test for a content line (C4 keeps such lines)
LINE_PUNCT_PATTERN = r"[.!?\"']$"


def boilerplate_line_filter(
    text: Column | str,
    min_chars: int = 30,
    require_punct: bool = True,
) -> Column:
    """Keep only content-looking lines of ``text``: at least
    ``min_chars`` after trimming and (optionally) ending in terminal
    punctuation.  An array higher-order filter — split, filter, rejoin —
    no shuffle, no UDF; the per-row cost is linear in the line count.
    """
    lines = F.split(_col(text), "\n")

    def keep(line: Column) -> Column:
        t = F.trim(line)
        cond = F.length(t) >= min_chars
        if require_punct:
            cond = cond & t.rlike(LINE_PUNCT_PATTERN)
        return cond

    return F.array_join(F.transform(F.filter(lines, keep), F.trim), "\n")
