"""Rule-based temporal-expression and quantity extraction from text —
the TIMEX2/TIMEX3-style normalization layer (Ferro et al. 2005; the
TempEval surface-form subset) and the measured-value harvest that turn
free text into KG-ready attribute and validity columns.

Both operators are pure JVM regex pipelines (regexp_extract_all ->
explode -> normalize), zero UDFs, and every normalization steers
through integer arithmetic or single literal-expression float paths so
the DuckDB twins replay bit-for-bit.

Deliberately NOT covered (documented scope, matching the rule-based
tier of real systems): relative expressions ("yesterday", "next
Tuesday") need a document creation time + calendar arithmetic;
cross-token ranges ("from March to May"); non-Gregorian calendars.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_MONTHS = {
    "january": 1, "jan": 1,
    "february": 2, "feb": 2,
    "march": 3, "mar": 3,
    "april": 4, "apr": 4,
    "may": 5,
    "june": 6, "jun": 6,
    "july": 7, "jul": 7,
    "august": 8, "aug": 8,
    "september": 9, "sep": 9,
    "october": 10, "oct": 10,
    "november": 11, "nov": 11,
    "december": 12, "dec": 12,
}

_MONTH_ALT = "|".join(sorted(_MONTHS, key=len, reverse=True))

# the three surface forms, over the LOWERCASED text
TIMEX_ISO = r"\b(\d{4})-(\d{2})-(\d{2})\b"
TIMEX_MDY = rf"\b({_MONTH_ALT})\.?\s+(\d{{1,2}})(?:st|nd|rd|th)?,?\s+(\d{{4}})\b"
TIMEX_DMY = rf"\b(\d{{1,2}})(?:st|nd|rd|th)?\s+(?:of\s+)?({_MONTH_ALT})\.?,?\s+(\d{{4}})\b"


def month_number_case(col: str) -> str:
    """SQL CASE mapping a lowercased month name/abbreviation to its
    number — shared between the Spark plan (F.expr) and the DuckDB
    twin so the table can never drift."""
    whens = " ".join(
        f"WHEN '{name}' THEN {num}" for name, num in _MONTHS.items()
    )
    return f"CASE {col} {whens} ELSE NULL END"


def _sql_pat(pat: str) -> str:
    """Escape a regex for embedding in a Spark SQL string literal
    (the SQL parser consumes one level of backslash escapes)."""
    return pat.replace("\\", "\\\\")


def _extract(df: DataFrame, id_col: str, low: str, pat: str, kind: str):
    spat = _sql_pat(pat)
    return df.select(
        F.col(id_col).alias("id"),
        F.lit(kind).alias("form"),
        F.explode(
            F.expr(f"regexp_extract_all({low}, '{spat}', 0)")
        ).alias("raw"),
    )


def timex_normalize(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Extract absolute date expressions (ISO yyyy-mm-dd, 'March 5,
    2024' incl. abbreviations/ordinals, '5 March 2024' / '5th of
    march 2024') and normalize each to the TIMEX value form
    yyyy-mm-dd. Output: (id, form, raw, year, month, day, norm_date),
    one row per occurrence (duplicates kept — each mention is a
    separate anchor for fact-validity intervals), implausible
    calendar values dropped (month 1-12, day 1-31; no per-month day
    checks — TIMEX normalizers defer those to the calendar layer).

    Scale shape: per surface form one regexp_extract_all projection +
    explode — narrow, shuffle-free; the union is 3 map stages."""
    low = f"lower(coalesce({text_col}, ''))"
    iso = _extract(df, id_col, low, TIMEX_ISO, "iso").select(
        "id",
        "form",
        "raw",
        F.expr(f"cast(regexp_extract(raw, '{_sql_pat(TIMEX_ISO)}', 1) as int)").alias(
            "year"
        ),
        F.expr(f"cast(regexp_extract(raw, '{_sql_pat(TIMEX_ISO)}', 2) as int)").alias(
            "month"
        ),
        F.expr(f"cast(regexp_extract(raw, '{_sql_pat(TIMEX_ISO)}', 3) as int)").alias(
            "day"
        ),
    )
    mdy = _extract(df, id_col, low, TIMEX_MDY, "mdy").select(
        "id",
        "form",
        "raw",
        F.expr(f"cast(regexp_extract(raw, '{_sql_pat(TIMEX_MDY)}', 3) as int)").alias(
            "year"
        ),
        F.expr(
            month_number_case(f"regexp_extract(raw, '{_sql_pat(TIMEX_MDY)}', 1)")
        ).cast("int").alias("month"),
        F.expr(f"cast(regexp_extract(raw, '{_sql_pat(TIMEX_MDY)}', 2) as int)").alias(
            "day"
        ),
    )
    dmy = _extract(df, id_col, low, TIMEX_DMY, "dmy").select(
        "id",
        "form",
        "raw",
        F.expr(f"cast(regexp_extract(raw, '{_sql_pat(TIMEX_DMY)}', 3) as int)").alias(
            "year"
        ),
        F.expr(
            month_number_case(f"regexp_extract(raw, '{_sql_pat(TIMEX_DMY)}', 2)")
        ).cast("int").alias("month"),
        F.expr(f"cast(regexp_extract(raw, '{_sql_pat(TIMEX_DMY)}', 1) as int)").alias(
            "day"
        ),
    )
    out = iso.unionByName(mdy).unionByName(dmy).where(
        F.col("month").between(1, 12) & F.col("day").between(1, 31)
    )
    return out.select(
        F.col("id").alias(id_col),
        "form",
        "raw",
        "year",
        "month",
        "day",
        F.expr(
            "concat(lpad(cast(year as string), 4, '0'), '-',"
            " lpad(cast(month as string), 2, '0'), '-',"
            " lpad(cast(day as string), 2, '0'))"
        ).alias("norm_date"),
    )


# value scales: name -> multiplier applied in micro-units
_SCALES = {
    "thousand": 1_000,
    "k": 1_000,
    "million": 1_000_000,
    "m": 1_000_000,
    "mm": 1_000_000,
    "billion": 1_000_000_000,
    "bn": 1_000_000_000,
    "b": 1_000_000_000,
    "trillion": 1_000_000_000_000,
}
_SCALE_ALT = "|".join(sorted(_SCALES, key=len, reverse=True))

QUANTITY_RE = (
    # scale words take a trailing \b so 'km' is a unit, not scale
    # 'k' + stray 'm' (% stays boundary-free: \b needs a word char)
    r"(\$|€|£)?\s?(\d+(?:,\d{3})*(?:\.\d+)?)\s*"
    rf"(?:({_SCALE_ALT})\b)?\s*(%|ghz|mhz|hz|gb|mb|kb|tb|kg|km|mi|lbs?|°c|°f)?"
)


def scale_multiplier_case(col: str) -> str:
    whens = " ".join(
        f"WHEN '{name}' THEN {mult}" for name, mult in _SCALES.items()
    )
    return f"CASE {col} WHEN '' THEN 1 {whens} ELSE 1 END"


def extract_quantities(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Extract measured values: [currency]? number [scale-word]?
    [unit]? — '$5.2 million', '3,200 km', '4.5ghz', '12%'. Output
    (id, raw, currency, unit, value_micro) with value_micro =
    round(number * scale * 1e6) as BIGINT: micro-unit fixed point, so
    '$5.2 million' -> 5_200_000_000_000. Matches with neither
    currency, scale, nor unit are dropped (bare numbers are ids and
    years, not quantities). Thousands separators accepted and
    stripped. The float leg is ONE literal expression
    (cast -> multiply -> round) evaluated identically by any
    IEEE-754 engine, then everything is integer again.

    Scale shape: one regexp_extract_all + explode + projection."""
    low = f"lower(coalesce({text_col}, ''))"
    hits = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.expr(f"regexp_extract_all({low}, '{_sql_pat(QUANTITY_RE)}', 0)")
        ).alias("raw"),
    )
    g = lambda i: f"regexp_extract(raw, '{_sql_pat(QUANTITY_RE)}', {i})"  # noqa: E731
    out = hits.select(
        "id",
        "raw",
        F.expr(f"nullif({g(1)}, '')").alias("currency"),
        F.expr(f"nullif({g(4)}, '')").alias("unit"),
        F.expr(f"nullif({g(3)}, '')").alias("_scale"),
        F.expr(f"replace({g(2)}, ',', '')").alias("_num"),
    )
    mult = scale_multiplier_case("coalesce(_scale, '')")
    return (
        out.where(
            F.col("currency").isNotNull()
            | F.col("unit").isNotNull()
            | F.col("_scale").isNotNull()
        )
        .select(
            F.col("id").alias(id_col),
            F.trim(F.col("raw")).alias("raw"),
            "currency",
            "unit",
            F.expr(
                f"cast(round(cast(_num as double) * ({mult}) * 1000000)"
                " as bigint)"
            ).alias("value_micro"),
        )
    )
