"""PII detection/redaction for training-data pipelines.

A corpus destined for model training must be scrubbed of personally
identifiable information before tokenization; this is a standard stage
of every published LLM data pipeline (C4 removed pages on bad-word
lists; later pipelines regex-scrub emails/phones/IPs in place).

All pure built-in ``regexp_replace`` / ``regexp_extract_all``
expressions — JVM-side, whole-stage codegen, zero Python in the hot
path. The patterns are deliberately RE2-compatible (no backreferences,
no lookaround) so the same pattern string runs bit-identically on the
DuckDB oracle side of the correctness gate.

Scale note: redaction is embarrassingly parallel (per-row, no shuffle);
at 100 TB it rides the scan stage and costs only CPU inside
WholeStageCodegen. Counting before redacting shares the same scan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Ordered: redaction is applied in this order, and pii_count counts
# kind K on text with all EARLIER kinds already replaced — so a span
# inside an already-matched earlier kind is never double-counted
# (e.g. the phone-shaped digits in '555-123-4567@ex.com' count as
# email only, because <EMAIL> has replaced them before phone counting).
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "phone": (r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
}


def pii_count(text: Column, kind: str) -> Column:
    """Occurrence count of one PII kind, counted on text with all
    earlier kinds (PII_PATTERNS order) progressively redacted — the
    counts therefore partition the PII spans instead of overlapping.
    Still pure chained regexp inside codegen; the earlier replacements
    are recomputed per kind, trading a few regex passes (cheap, scan-
    stage CPU) for count consistency with redact_pii's output."""
    kinds = list(PII_PATTERNS)
    for earlier in kinds[: kinds.index(kind)]:
        pat, repl = PII_PATTERNS[earlier]
        text = F.regexp_replace(text, pat, repl)
    pattern, _ = PII_PATTERNS[kind]
    return F.size(F.regexp_extract_all(text, F.lit(pattern), F.lit(0)))


def pii_counts(text: Column) -> dict[str, Column]:
    """All kinds' counts from ONE progressive redaction chain: kind K
    is counted on the intermediate with every earlier kind already
    replaced (same partition-not-overlap semantics as ``pii_count``),
    but the earlier replacements are SHARED down the chain instead of
    recomputed per kind — linear in #kinds where per-kind
    ``pii_count`` calls are quadratic. Use this when projecting counts
    for every kind at once (the gated ``pii_redaction`` query does)."""
    out: dict[str, Column] = {}
    cur = text
    for kind, (pattern, repl) in PII_PATTERNS.items():
        out[kind] = F.size(
            F.regexp_extract_all(cur, F.lit(pattern), F.lit(0))
        )
        cur = F.regexp_replace(cur, pattern, repl)
    return out


def redact_pii(text: Column, kinds: tuple[str, ...] | None = None) -> Column:
    """Replace every PII occurrence with its typed placeholder.

    Chained ``regexp_replace`` in PII_PATTERNS order; each pattern
    replaces ALL occurrences (Spark default; the DuckDB twin needs the
    explicit ``'g'`` flag).
    """
    out = text
    for kind in kinds or tuple(PII_PATTERNS):
        pattern, repl = PII_PATTERNS[kind]
        out = F.regexp_replace(out, pattern, repl)
    return out
