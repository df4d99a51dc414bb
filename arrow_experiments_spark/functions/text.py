"""Text column builders shared by the dedup / text-analysis operators.

Everything is built from JVM-side higher-order functions (transform /
filter / aggregate) — no Python UDFs in the hot path.  Each builder has a
matching DuckDB SQL fragment (the *_SQL constants) used by the oracle
strings, engineered so both engines compute bit-identical values:
  * token hashing goes through md5 hex (byte-identical in both engines);
  * "hash integers" are the first 4 md5 hex chars parsed as int (conv in
    Spark, positional strpos arithmetic in DuckDB — same number);
  * folds start from 0 on the Spark side, which coincides with DuckDB's
    first-element-seeded list_reduce for the operations used here
    ((0*31+v)%m == v and 0.0+x == x).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---- tokenization ---------------------------------------------------------

TOKENS_SQL = "list_filter(string_split_regex(lower({col}), '\\s+'), x -> x <> '')"

# The engine-wide English-stopword heuristic vocabulary (language-ID,
# quality scoring, the curation funnel).  Lives in this leaf module so
# both operators.text and operators.dedup can share it without a cycle.
EN_STOPWORDS = ["a", "the", "of", "and", "in", "to", "is", "on", "for", "with"]


def tokens(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), r"\s+"), lambda x: x != F.lit(""))


# ---- word shingles (k=3) --------------------------------------------------

SHINGLES3_SQL = (
    "list_transform(generate_series(1, greatest(len({t}) - 2, 0)),"
    " i -> array_to_string(({t})[i:i+2], ' '))"
)


def shingles3(toks: Column) -> Column:
    """3-word shingles: ['a b c', 'b c d', ...]; empty below 3 tokens."""
    sh = F.transform(
        F.sequence(F.lit(0), F.size(toks) - 3),
        lambda i: F.concat_ws(
            " ",
            F.element_at(toks, i + 1),
            F.element_at(toks, i + 2),
            F.element_at(toks, i + 3),
        ),
    )
    return F.when(F.size(toks) >= 3, sh).otherwise(
        F.array().cast("array<string>")
    )


# ---- md5-derived hashing --------------------------------------------------


def md5_str(col: Column) -> Column:
    """Lowercase hex md5 of a string column (bytewise identical to DuckDB
    ``md5(varchar)``)."""
    return F.md5(col.cast("binary"))


def minhash_sig(shingle_arr: Column | str, seed: int) -> Column:
    """One MinHash signature: lexicographic min of salted md5 hex digests.
    Min over strings is engine-portable (no integer hashing semantics to
    match).  Oracle: ``list_min(list_transform(sh, s -> md5('{seed}:' || s)))``.

    Pass the shingle column by NAME where possible: the string form
    builds the expression with one JVM-side ``expr()`` parse instead of
    ~10 py4j round-trips for the Column/lambda form (r16: the 8-sig
    fan-out cost ~0.15 s of driver time per query build; measured
    value-identical and optimized-plan-identical to the Column form).
    """
    if isinstance(shingle_arr, str):
        return F.expr(minhash_sig_expr(shingle_arr, seed))
    return F.array_min(
        F.transform(shingle_arr, lambda s: md5_str(F.concat(F.lit(f"{seed}:"), s)))
    )


def minhash_sig_expr(sh: str, seed: int) -> str:
    """Spark-SQL string form of :func:`minhash_sig` (see its docstring);
    used directly in selectExpr fan-outs so the whole 8-signature select
    is ONE py4j call."""
    return (
        f"array_min(transform({sh}, "
        f"s -> md5(cast(concat('{seed}:', s) as binary))))"
    )


def minhash_sig_sql(sh: str, seed: int) -> str:
    return f"list_min(list_transform({sh}, s -> md5('{seed}:' || s)))"


# hex16: integer value of the first 4 md5-hex chars of a token (0..65535)
HEX16_SQL = (
    "((strpos('0123456789abcdef', md5({t})[1]) - 1) * 4096"
    " + (strpos('0123456789abcdef', md5({t})[2]) - 1) * 256"
    " + (strpos('0123456789abcdef', md5({t})[3]) - 1) * 16"
    " + (strpos('0123456789abcdef', md5({t})[4]) - 1))"
)


def hex16(tok: Column) -> Column:
    return F.conv(F.substring(md5_str(tok), 1, 4), 16, 10).cast("long")


# ---- rolling-hash fingerprint --------------------------------------------

_FP_MOD = 2147483647  # 2^31 - 1

FINGERPRINT_SQL = (
    "list_reduce(list_transform({t}, tok -> "
    + HEX16_SQL.format(t="tok")
    + f"), (acc, x) -> (acc * 31 + x) % {_FP_MOD})"
)


def fingerprint(toks: Column) -> Column:
    """Polynomial rolling hash over token hash values, mod 2^31-1.

    Spark folds from 0 ((0*31+v1)%m == v1), DuckDB's list_reduce seeds with
    the first element — identical results for non-empty token lists.
    """
    return F.aggregate(
        F.transform(toks, hex16),
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + x) % _FP_MOD,
    )
