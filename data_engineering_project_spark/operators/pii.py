"""PII detection and redaction for corpus cleaning.

Beyond-reference capability (BASELINE.json north star): pretraining
pipelines scrub personally-identifiable information (emails, IPv4
addresses, phone numbers) from raw text before training — the C4 /
RefinedWeb cleaning stage (public heuristics; e.g. Penedo et al. 2023
§3.4 line-wise filters).

Scale design: every pattern is a single JVM-side ``regexp_replace`` /
``rlike`` over the text column — pure Catalyst expressions inside
whole-stage codegen, no Python in the hot path, no shuffle at all for
the redaction itself (row-local). The summary aggregation shuffles
only (source, 4 small ints) per document.

The regexes deliberately stay inside the syntax subset shared by Java's
``java.util.regex`` (Spark) and RE2 (DuckDB oracle): character classes,
bounded repetition, alternation — no backreferences or lookaround, so
the same pattern string is verifiable on both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Pattern order matters: emails are redacted before IPv4 so a dotted
# quad inside a hostname local-part cannot be half-rewritten.
EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4 = r"\b[0-9]{1,3}(\.[0-9]{1,3}){3}\b"
PHONE = r"\+[0-9]{1,2} [0-9]{3}-[0-9]{4}"

PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", EMAIL, "[EMAIL]"),
    ("phone", PHONE, "[PHONE]"),
    ("ipv4", IPV4, "[IP]"),
)


def pii_flags(text: Column) -> dict[str, Column]:
    """Per-row 0/1 detection flags, one per PII class."""
    return {name: text.rlike(pat).cast("long") for name, pat, _ in PATTERNS}


def redact(text: Column) -> Column:
    """Replace every PII match with its class placeholder.

    Applied in PATTERNS order (email → phone → ipv4) so overlapping
    classes resolve deterministically on both engines.
    """
    out = text
    for _, pat, repl in PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def scan_and_redact(df: DataFrame, text_col: str, out_col: str = "redacted") -> DataFrame:
    """Append detection flags (``has_email``/``has_phone``/``has_ipv4``)
    and the fully-redacted text column."""
    text = F.col(text_col)
    for name, col in pii_flags(text).items():
        df = df.withColumn(f"has_{name}", col)
    return df.withColumn(out_col, redact(text))
