"""Text-analysis operators over the documents table (SURVEY.md §7 north
star): language-ID heuristic, quality scoring, token counting, document
fingerprinting.  All row-local column expressions — embarrassingly
parallel, no shuffle at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from arrow_experiments_spark.functions.text import (
    EN_STOPWORDS,
    FINGERPRINT_SQL,
    SHINGLES3_SQL,
    TOKENS_SQL,
    fingerprint,
    shingles3,
    tokens,
)
from arrow_experiments_spark.registry import register
from arrow_experiments_spark.tables import table, widen_if_narrow

_TOKS_SQL = TOKENS_SQL.format(col="text")

_EN_STOPWORDS = EN_STOPWORDS
_SW_SQL = "[" + ", ".join(f"'{w}'" for w in _EN_STOPWORDS) + "]"


@register(
    "text_language_id",
    "text",
    doc="language-ID heuristic: English stopword hit-ratio over tokens; "
    "row-local, zero shuffle.  Empty documents (0 tokens) get a NULL "
    "ratio and 'other' — under Spark's ANSI mode a bare division would "
    "abort the whole job on the first empty doc (inevitable at corpus "
    "scale), so the zero-divisor is NULLed in both engines.",
    oracle=f"""
        WITH t AS (SELECT doc_id, lang, {_TOKS_SQL} AS toks FROM documents)
        SELECT doc_id, lang,
               CAST(len(list_filter(toks, x -> list_contains({_SW_SQL}, x))) AS DOUBLE)
                   / NULLIF(len(toks), 0) AS en_stopword_ratio,
               CASE WHEN CAST(len(list_filter(toks, x -> list_contains({_SW_SQL}, x))) AS DOUBLE)
                         / NULLIF(len(toks), 0) >= 0.05
                    THEN 'en_like' ELSE 'other' END AS predicted
        FROM t
    """,
)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    sw = F.array(*[F.lit(w) for w in _EN_STOPWORDS])
    toks = tokens(F.col("text"))
    hits = F.size(F.filter(toks, lambda x: F.array_contains(sw, x)))
    ratio = F.try_divide(hits.cast("double"), F.size(toks))
    return table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        ratio.alias("en_stopword_ratio"),
        F.when(ratio >= 0.05, "en_like").otherwise("other").alias("predicted"),
    )


@register(
    "text_quality_score",
    "text",
    doc="quality scoring: token count, mean token length, punctuation "
    "ratio, repetition ratio (distinct/total tokens); composite score in "
    "deterministic double arithmetic.  Empty documents (0 tokens / 0 "
    "chars) yield NULL ratios instead of aborting the job under ANSI "
    "mode — NULLIF mirrors try_divide on the oracle side.",
    oracle=f"""
        WITH t AS (SELECT doc_id, n_chars, {_TOKS_SQL} AS toks, lower(text) AS lt
                   FROM documents)
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n_tokens,
               CAST(length(array_to_string(toks, '')) AS DOUBLE)
                   / NULLIF(len(toks), 0) AS mean_token_len,
               CAST(length(regexp_replace(lt, '[a-z0-9\\s]', '', 'g')) AS DOUBLE)
                   / NULLIF(n_chars, 0) AS punct_ratio,
               CAST(len(list_distinct(toks)) AS DOUBLE)
                   / NULLIF(len(toks), 0) AS distinct_ratio,
               CAST(len(toks) AS DOUBLE) / NULLIF(n_chars, 0) AS tokens_per_char
        FROM t
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    lt = F.lower(F.col("text"))
    n_tokens = F.size(toks)
    return docs.select(
        "doc_id",
        n_tokens.cast("bigint").alias("n_tokens"),
        F.try_divide(
            F.length(F.concat_ws("", toks)).cast("double"), n_tokens
        ).alias("mean_token_len"),
        F.try_divide(
            F.length(F.regexp_replace(lt, r"[a-z0-9\s]", "")).cast("double"),
            F.col("n_chars"),
        ).alias("punct_ratio"),
        F.try_divide(
            F.size(F.array_distinct(toks)).cast("double"), n_tokens
        ).alias("distinct_ratio"),
        F.try_divide(n_tokens.cast("double"), F.col("n_chars")).alias(
            "tokens_per_char"
        ),
    )


@register(
    "text_quality_rules",
    "text",
    doc="published Gopher-style document quality rules (Rae et al. 2021, "
    "'Scaling Language Models: ... Gopher', §A1.1 — public heuristics "
    "every large-corpus curation run applies) as one row-local gate: "
    "word count in [50, 100k], mean word length in [3, 10], >= 80% of "
    "words contain an alphabetic character, symbol-to-word ratio "
    "('#' and '...' occurrences per word) <= 0.1, and >= 2 stopword "
    "hits.  Emits each rule as its own boolean plus the conjunction, so "
    "a curation report can attribute rejections per rule.  Zero "
    "shuffles at any scale; divisions NULL out on empty docs in both "
    "engines (try_divide / NULLIF) instead of aborting under ANSI mode.",
    oracle=f"""
        WITH t AS (SELECT doc_id, lower(text) AS lt, {_TOKS_SQL} AS toks
                   FROM documents),
        s AS (
            SELECT doc_id,
                   CAST(len(toks) AS BIGINT) AS n_words,
                   CAST(length(array_to_string(toks, '')) AS DOUBLE)
                       / NULLIF(len(toks), 0) AS mean_len,
                   CAST(len(list_filter(toks,
                            x -> regexp_matches(x, '[a-z]'))) AS DOUBLE)
                       / NULLIF(len(toks), 0) AS alpha_frac,
                   CAST((length(lt) - length(replace(lt, '#', '')))
                        + (length(lt) - length(replace(lt, '...', ''))) / 3
                        AS DOUBLE)
                       / NULLIF(len(toks), 0) AS symbol_ratio,
                   len(list_filter(toks,
                       x -> list_contains({_SW_SQL}, x))) AS sw_hits
            FROM t
        )
        SELECT doc_id, n_words,
               n_words BETWEEN 50 AND 100000 AS rule_word_count,
               mean_len BETWEEN 3 AND 10 AS rule_mean_word_len,
               alpha_frac >= 0.8 AS rule_alpha_words,
               symbol_ratio <= 0.1 AS rule_symbol_ratio,
               sw_hits >= 2 AS rule_stopwords,
               COALESCE(n_words BETWEEN 50 AND 100000, FALSE)
                   AND COALESCE(mean_len BETWEEN 3 AND 10, FALSE)
                   AND COALESCE(alpha_frac >= 0.8, FALSE)
                   AND COALESCE(symbol_ratio <= 0.1, FALSE)
                   AND COALESCE(sw_hits >= 2, FALSE) AS passes
        FROM s
    """,
)
def text_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    lt = F.lower(F.col("text"))
    toks = tokens(F.col("text"))
    n_words = F.size(toks).cast("bigint")
    mean_len = F.try_divide(
        F.length(F.concat_ws("", toks)).cast("double"), n_words
    )
    sw = F.array(*[F.lit(w) for w in _EN_STOPWORDS])
    alpha_frac = F.try_divide(
        F.size(F.filter(toks, lambda x: x.rlike("[a-z]"))).cast("double"),
        n_words,
    )
    symbol_ratio = F.try_divide(
        (
            (F.length(lt) - F.length(F.replace(lt, F.lit("#"), F.lit(""))))
            + (F.length(lt) - F.length(F.replace(lt, F.lit("..."), F.lit(""))))
            / 3
        ).cast("double"),
        n_words,
    )
    sw_hits = F.size(F.filter(toks, lambda x: F.array_contains(sw, x)))
    r_wc = n_words.between(50, 100000)
    r_ml = mean_len.between(3, 10)
    r_af = alpha_frac >= 0.8
    r_sr = symbol_ratio <= 0.1
    r_sw = sw_hits >= 2
    passes = (
        F.coalesce(r_wc, F.lit(False))
        & F.coalesce(r_ml, F.lit(False))
        & F.coalesce(r_af, F.lit(False))
        & F.coalesce(r_sr, F.lit(False))
        & F.coalesce(r_sw, F.lit(False))
    )
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        r_wc.alias("rule_word_count"),
        r_ml.alias("rule_mean_word_len"),
        r_af.alias("rule_alpha_words"),
        r_sr.alias("rule_symbol_ratio"),
        r_sw.alias("rule_stopwords"),
        passes.alias("passes"),
    )


@register(
    "text_token_count",
    "text",
    doc="token counting: whitespace tokens, BPE-ish regex tokens "
    "([a-z]+|[0-9]+|punct), and the chars/4 heuristic.",
    oracle=f"""
        SELECT doc_id,
               CAST(len({_TOKS_SQL}) AS BIGINT) AS ws_tokens,
               CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]'))
                    AS BIGINT) AS regex_tokens,
               CAST(ceil(n_chars / 4.0) AS BIGINT) AS est_bpe_tokens
        FROM documents
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(tokens(F.col("text"))).cast("bigint").alias("ws_tokens"),
        F.size(
            F.regexp_extract_all(F.lower("text"), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0)
        ).cast("bigint").alias("regex_tokens"),
        F.ceil(F.col("n_chars") / 4.0).cast("bigint").alias("est_bpe_tokens"),
    )


@register(
    "text_fingerprint",
    "text",
    doc="document fingerprint: polynomial rolling hash (base 31, mod 2³¹-1) "
    "over md5-derived token values; collision groups surfaced via count.",
    oracle=f"""
        WITH fp AS (
            SELECT doc_id, {FINGERPRINT_SQL.format(t=_TOKS_SQL)} AS fingerprint
            FROM documents
        )
        SELECT doc_id, fingerprint,
               COUNT(*) OVER (PARTITION BY fingerprint) AS n_same
        FROM fp
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", fingerprint(tokens(F.col("text"))).alias("fingerprint")
    )
    w = Window.partitionBy("fingerprint")
    return docs.select("doc_id", "fingerprint", F.count(F.lit(1)).over(w).alias("n_same"))


@register(
    "pipeline_training_select",
    "text",
    doc="end-to-end training-set selection: quality-signal computation "
    "(token count, distinct ratio, stopword ratio) → threshold filter "
    "(length ≥ 20 tokens, repetition and language heuristics) → exact "
    "content dedup keeping the canonical (min doc_id) copy.  The shape of "
    "a real 100 TB corpus-curation job: the quality stage is row-local "
    "(zero shuffle), and only the already-filtered survivors pay the "
    "dedup shuffle on the content hash.",
    oracle=f"""
        WITH t AS (SELECT doc_id, lang, text, {_TOKS_SQL} AS toks FROM documents),
        s AS (
            SELECT doc_id, lang, text,
                   CAST(len(toks) AS BIGINT) AS n_tokens,
                   CAST(len(list_distinct(toks)) AS DOUBLE)
                       / NULLIF(len(toks), 0) AS distinct_ratio,
                   CAST(len(list_filter(toks, x -> list_contains({_SW_SQL}, x))) AS DOUBLE)
                       / NULLIF(len(toks), 0) AS stopword_ratio
            FROM t
        ), kept AS (
            SELECT * FROM s
            WHERE n_tokens >= 20 AND distinct_ratio >= 0.4 AND stopword_ratio >= 0.05
        )
        SELECT MIN(doc_id) AS doc_id, md5(text) AS content_hash,
               CAST(COUNT(*) AS BIGINT) AS n_copies,
               MIN(lang) AS lang, MIN(n_tokens) AS n_tokens
        FROM kept GROUP BY md5(text)
    """,
)
def pipeline_training_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arrow_experiments_spark.functions.text import md5_str

    docs = table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    n_tokens = F.size(toks)
    sw = F.array(*[F.lit(w) for w in _EN_STOPWORDS])
    scored = docs.select(
        "doc_id",
        "lang",
        "text",
        n_tokens.cast("bigint").alias("n_tokens"),
        F.try_divide(
            F.size(F.array_distinct(toks)).cast("double"), n_tokens
        ).alias("distinct_ratio"),
        F.try_divide(
            F.size(F.filter(toks, lambda x: F.array_contains(sw, x))).cast(
                "double"
            ),
            n_tokens,
        ).alias("stopword_ratio"),
    )
    kept = scored.filter(
        (F.col("n_tokens") >= 20)
        & (F.col("distinct_ratio") >= 0.4)
        & (F.col("stopword_ratio") >= 0.05)
    )
    return kept.groupBy(md5_str(F.col("text")).alias("content_hash")).agg(
        F.min("doc_id").alias("doc_id"),
        F.count(F.lit(1)).cast("bigint").alias("n_copies"),
        F.min("lang").alias("lang"),
        F.min("n_tokens").alias("n_tokens"),
    ).select("doc_id", "content_hash", "n_copies", "lang", "n_tokens")


_BIGRAMS_SQL = (
    "list_transform(generate_series(1, greatest(len({t}) - 1, 0)),"
    " i -> array_to_string(({t})[i:i+1], ' '))"
)
_TRIGRAMS_SQL = (
    "list_transform(generate_series(1, greatest(len({t}) - 2, 0)),"
    " i -> array_to_string(({t})[i:i+2], ' '))"
)


def _bigrams(toks: F.Column) -> F.Column:
    bi = F.transform(
        F.sequence(F.lit(0), F.size(toks) - 2),
        lambda i: F.concat_ws(
            " ", F.element_at(toks, i + 1), F.element_at(toks, i + 2)
        ),
    )
    return F.when(F.size(toks) >= 2, bi).otherwise(F.array().cast("array<string>"))


@register(
    "text_repetition_signals",
    "text",
    doc="repetition-based quality filters (the Gopher/C4-style signals a "
    "training pipeline gates on): top-unigram and top-bigram occupancy "
    "plus duplicate-trigram fraction per document.  The n-gram frequency "
    "tables are explode -> groupBy(doc_id, gram) -> max/sum — the shuffle "
    "key is (doc_id, gram), high-cardinality and uniform, so the shape "
    "holds at any corpus size; the trigram dup fraction is row-local.",
    oracle=f"""
        WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
        uc AS (
            SELECT doc_id, tok, COUNT(*) AS c
            FROM (SELECT doc_id, unnest(toks) AS tok FROM t)
            GROUP BY doc_id, tok
        ),
        ua AS (
            SELECT doc_id, MAX(c) AS top_uni, SUM(c) AS n_uni FROM uc GROUP BY doc_id
        ),
        bc AS (
            SELECT doc_id, bg, COUNT(*) AS c
            FROM (SELECT doc_id, unnest({_BIGRAMS_SQL.format(t='toks')}) AS bg FROM t)
            GROUP BY doc_id, bg
        ),
        ba AS (
            SELECT doc_id, MAX(c) AS top_bi, SUM(c) AS n_bi FROM bc GROUP BY doc_id
        ),
        tr AS (
            SELECT doc_id,
                   len({_TRIGRAMS_SQL.format(t='toks')}) AS n_tri,
                   len(list_distinct({_TRIGRAMS_SQL.format(t='toks')})) AS d_tri
            FROM t
        )
        SELECT ua.doc_id,
               CAST(ua.top_uni AS DOUBLE) / ua.n_uni AS top_unigram_frac,
               CAST(ba.top_bi AS DOUBLE) / ba.n_bi AS top_bigram_frac,
               CAST(1.0 AS DOUBLE) - CAST(tr.d_tri AS DOUBLE) / tr.n_tri
                   AS dup_trigram_frac
        FROM ua JOIN ba ON ua.doc_id = ba.doc_id
                JOIN tr ON ua.doc_id = tr.doc_id
    """,
)
def text_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arrow_experiments_spark.functions.text import shingles3

    # persist barrier: three consumers below would each re-inline the
    # tokenize chain (no CSE across HOF lambdas)
    toks_df = (
        widen_if_narrow(
            table(spark, sf_dir, "documents"), spark, sf_dir, "documents"
        )
        .select("doc_id", tokens(F.col("text")).alias("toks"))
        .persist()
    )
    uni = (
        toks_df.select("doc_id", F.explode("toks").alias("tok"))
        .groupBy("doc_id", "tok")
        .count()
        .groupBy("doc_id")
        .agg(F.max("count").alias("top_uni"), F.sum("count").alias("n_uni"))
    )
    bi = (
        toks_df.select("doc_id", F.explode(_bigrams(F.col("toks"))).alias("bg"))
        .groupBy("doc_id", "bg")
        .count()
        .groupBy("doc_id")
        .agg(F.max("count").alias("top_bi"), F.sum("count").alias("n_bi"))
    )
    tri = toks_df.select(
        "doc_id",
        F.size(shingles3(F.col("toks"))).alias("n_tri"),
        F.size(F.array_distinct(shingles3(F.col("toks")))).alias("d_tri"),
    )
    return (
        uni.join(bi, "doc_id")
        .join(tri, "doc_id")
        .select(
            "doc_id",
            (F.col("top_uni").cast("double") / F.col("n_uni")).alias("top_unigram_frac"),
            (F.col("top_bi").cast("double") / F.col("n_bi")).alias("top_bigram_frac"),
            (F.lit(1.0) - F.col("d_tri").cast("double") / F.col("n_tri")).alias(
                "dup_trigram_frac"
            ),
        )
    )


# k-th (0-based) byte of a lowercase-hex digest, as DuckDB SQL int
def _hexbyte_sql(h: str, k: int) -> str:
    return (
        f"((strpos('0123456789abcdef', {h}[{2 * k + 1}]) - 1) * 16"
        f" + (strpos('0123456789abcdef', {h}[{2 * k + 2}]) - 1))"
    )


_MIX_RATES = {"en": 204, "de": 102, "fr": 102, "es": 102, "zh": 51}  # of 256


@register(
    "pipeline_stratified_sample",
    "text",
    doc="deterministic stratified sampling for data mixing: keep a "
    "document iff the first byte of md5(text) falls under its language's "
    "mixing rate (en 80%, de/fr/es 40%, zh 20% of 256).  Content-hash "
    "gating is reproducible across engines, reruns, and corpus "
    "repartitions — no RNG state — and is row-local: zero shuffle at any "
    "scale.  The rate table is the tunable mixing-weights config.",
    oracle=f"""
        SELECT doc_id, lang, source
        FROM documents
        WHERE {_hexbyte_sql("md5(text)", 0)} <
              CASE lang {' '.join(f"WHEN '{k}' THEN {v}" for k, v in _MIX_RATES.items())}
                   ELSE 0 END
    """,
)
def pipeline_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arrow_experiments_spark.functions.text import md5_str

    docs = table(spark, sf_dir, "documents")
    first_byte = F.conv(F.substring(md5_str(F.col("text")), 1, 2), 16, 10).cast("int")
    rate = F.lit(0)
    for lang, thr in _MIX_RATES.items():
        rate = F.when(F.col("lang") == lang, F.lit(thr)).otherwise(rate)
    return docs.filter(first_byte < rate).select("doc_id", "lang", "source")


@register(
    "text_unigram_popularity",
    "text",
    doc="unigram-LM quality proxy: corpus-wide token frequency table "
    "(vocabulary-sized by Heaps' law — broadcastable at any corpus "
    "scale), broadcast-joined back onto the exploded token stream, then "
    "one per-document regroup.  All sums are over integers (exact, "
    "order-independent); the only double op is the final division, so "
    "the score is bit-identical across engines.  popularity = "
    "sum(corpus_count(tok)) / (n_tokens * corpus_total) — the mean "
    "relative frequency of the document's tokens, the transcendental-free "
    "stand-in for mean unigram log-prob.",
    oracle=f"""
        WITH tok AS (SELECT doc_id, unnest({_TOKS_SQL}) AS tok FROM documents),
        freq AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS tok_count
                 FROM tok GROUP BY tok),
        tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM tok)
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(SUM(tok_count) AS BIGINT) AS sum_counts,
               CAST(SUM(tok_count) AS DOUBLE)
                   / CAST(COUNT(*) * MAX(total) AS DOUBLE) AS popularity
        FROM tok JOIN freq USING (tok) CROSS JOIN tot
        GROUP BY doc_id
    """,
)
def text_unigram_popularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    # Materialize the exploded token stream once: it feeds three stages
    # (frequency agg, corpus total, the scoring join) and the tokenizer is
    # a split/filter HOF chain Catalyst would otherwise re-inline into
    # each (no CSE across HOF lambdas — see _minhash_bands).
    tok = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
    ).persist()
    freq = tok.groupBy("tok").agg(F.count("*").cast("bigint").alias("tok_count"))
    tot = tok.agg(F.count("*").cast("bigint").alias("total"))
    return (
        # freq is vocabulary-sized (Heaps-law sublinear but still
        # SF-scaled) — no hint; AQE broadcasts it at bench SF.
        tok.join(freq, "tok")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.sum("tok_count").cast("bigint").alias("sum_counts"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            "n_tokens",
            "sum_counts",
            (
                F.col("sum_counts").cast("double")
                / (F.col("n_tokens") * F.col("total")).cast("double")
            ).alias("popularity"),
        )
    )


_SHUFFLE_SEED = "epoch0"
_SHUFFLE_SHARDS = 8


@register(
    "pipeline_global_shuffle",
    "text",
    doc="deterministic epoch shuffle for training order: order_key = "
    "md5(seed ':' doc_id) gives every document a pseudorandom but "
    "reproducible position; shard_id = first hash byte mod "
    f"{_SHUFFLE_SHARDS} (row-local, no shuffle), shard_pos = rank of "
    "order_key inside the shard (one window partitioned by shard).  A "
    "global total order would serialize on one partition; sharding is "
    "how training readers consume a shuffled corpus anyway (interleave "
    "shards, read each in order).  At 100 TB the shard count rises to "
    "whatever bounds a shard to one output file — the plan shape is "
    "unchanged.  Re-keying the seed re-shuffles reproducibly per epoch.",
    oracle=f"""
        WITH h AS (
            SELECT doc_id,
                   md5(concat('{_SHUFFLE_SEED}:', CAST(doc_id AS VARCHAR))) AS order_key
            FROM documents
        )
        SELECT doc_id, order_key,
               CAST({_hexbyte_sql("order_key", 0)} % {_SHUFFLE_SHARDS} AS INT)
                   AS shard_id,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY {_hexbyte_sql("order_key", 0)} % {_SHUFFLE_SHARDS}
                   ORDER BY order_key, doc_id) AS BIGINT) AS shard_pos
        FROM h
    """,
)
def pipeline_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from arrow_experiments_spark.functions.text import md5_str

    keyed = table(spark, sf_dir, "documents").select(
        "doc_id",
        md5_str(
            F.concat(F.lit(f"{_SHUFFLE_SEED}:"), F.col("doc_id").cast("string"))
        ).alias("order_key"),
    )
    sharded = keyed.select(
        "doc_id",
        "order_key",
        (
            F.conv(F.substring("order_key", 1, 2), 16, 10).cast("int")
            % _SHUFFLE_SHARDS
        ).alias("shard_id"),
    )
    w = Window.partitionBy("shard_id").orderBy("order_key", "doc_id")
    return sharded.select(
        "doc_id",
        "order_key",
        "shard_id",
        F.row_number().over(w).cast("bigint").alias("shard_pos"),
    )


_SHARD_TOKEN_CAP = 512


@register(
    "pipeline_pack_shards",
    "text",
    doc="sequence packing for training shards: within each source (the "
    "parallel unit — a global order would serialize), documents ordered "
    "by doc_id accumulate whitespace-token counts and split into shards "
    f"of ≤{_SHARD_TOKEN_CAP} tokens (shard_id = floor(cumsum_before/cap)); "
    "shard_pos numbers documents inside their shard.  One window "
    "partitioned by source — shuffle on source only, scales with source "
    "count; at 100 TB the partition key becomes (source, day) or a hash "
    "prefix to bound partition size.",
    oracle=f"""
        WITH t AS (
            SELECT source, doc_id, CAST(len({_TOKS_SQL}) AS BIGINT) AS n_tokens
            FROM documents
        ), c AS (
            SELECT source, doc_id, n_tokens,
                   SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       - n_tokens AS cum_before
            FROM t
        )
        SELECT source, doc_id, n_tokens,
               CAST(cum_before // {_SHARD_TOKEN_CAP} AS BIGINT) AS shard_id,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY source, cum_before // {_SHARD_TOKEN_CAP}
                   ORDER BY doc_id) AS BIGINT) AS shard_pos
        FROM c
    """,
)
def pipeline_pack_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = table(spark, sf_dir, "documents").select(
        "source",
        "doc_id",
        F.size(tokens(F.col("text"))).cast("bigint").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = docs.withColumn(
        "cum_before", F.sum("n_tokens").over(w) - F.col("n_tokens")
    ).withColumn(
        "shard_id", F.floor(F.col("cum_before") / _SHARD_TOKEN_CAP).cast("bigint")
    )
    w2 = Window.partitionBy("source", "shard_id").orderBy("doc_id")
    return packed.select(
        "source",
        "doc_id",
        "n_tokens",
        "shard_id",
        F.row_number().over(w2).cast("bigint").alias("shard_pos"),
    )


# ---- cross-document passage overlap ---------------------------------------

_SH_DISTINCT_SQL = f"list_distinct({SHINGLES3_SQL.format(t=_TOKS_SQL)})"


@register(
    "text_shared_ngram_fraction",
    "text",
    doc="C4-style passage-overlap signal: for each document, the fraction "
    "of its DISTINCT 3-word shingles that also occur in at least one "
    "other document.  Two shuffles, both bounded: a count window keyed "
    "on shingle (document frequency — vocabulary-cubed in principle, "
    "Heaps-law sublinear in practice, same posture as "
    "text_tfidf_top_terms' term table, and the same clustering a "
    "groupBy+join would shuffle for, minus the join and the second "
    "consumption of the exploded shingle stream) and a regroup on "
    "doc_id.  No pair emission at all — this is "
    "the per-document overlap SCORE, the cheap filter that runs before "
    "any pairwise near-dup join at 100 TB.  All counts are exact "
    "integers; the only double op is the final division (NULL for "
    "shingle-less docs under 3 tokens, both engines).",
    oracle=f"""
        WITH s AS (
            SELECT doc_id, unnest({_SH_DISTINCT_SQL}) AS sh FROM documents
        ), df AS (
            SELECT sh, CAST(COUNT(*) AS BIGINT) AS n_docs FROM s GROUP BY sh
        ), per AS (
            SELECT doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_shingles,
                   CAST(SUM(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_shared
            FROM s JOIN df USING (sh) GROUP BY doc_id
        )
        SELECT d.doc_id,
               COALESCE(per.n_shingles, 0) AS n_shingles,
               COALESCE(per.n_shared, 0) AS n_shared,
               CAST(per.n_shared AS DOUBLE) / NULLIF(per.n_shingles, 0)
                   AS shared_fraction
        FROM documents d LEFT JOIN per USING (doc_id)
    """,
)
def text_shared_ngram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    # ONE persist barrier after tokenization — otherwise each element_at
    # inside the shingle lambda re-inlines the whole split/filter
    # tokenizer (no CSE across HOF lambdas; measured 14.4 s → ~2 s on
    # the shingle stage alone at 1×).  widen_if_narrow: the scan only
    # repartitions when the source is too small to parallelize
    # naturally (scale-adaptive — see tables.widen_if_narrow).
    # The exploded shingle stream is NOT persisted (r16): the
    # document frequency is a count window keyed on sh, so the stream
    # has a single consumer — the previous groupBy(sh)+join form read it
    # twice (df aggregate + join probe) and needed a second cache; the
    # window needs the same clustering on sh the join's probe-side
    # shuffle paid anyway (identical skew posture), one pass, no join.
    toks = (
        widen_if_narrow(
            table(spark, sf_dir, "documents"), spark, sf_dir, "documents"
        )
        .select("doc_id", tokens(F.col("text")).alias("toks"))
        .persist()
    )
    sh = toks.select(
        "doc_id",
        F.explode(F.array_distinct(shingles3(F.col("toks")))).alias("sh"),
    )
    wdf = Window.partitionBy("sh")
    per = (
        sh.withColumn("n_docs", F.count(F.lit(1)).over(wdf))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.sum((F.col("n_docs") >= 2).cast("bigint"))
            .cast("bigint")
            .alias("n_shared"),
        )
    )
    # Left join back so shingle-less documents (<3 tokens) keep a row —
    # they are exactly the ones a quality filter must still see.  The
    # doc_id spine comes from the persisted toks frame, not a second
    # parquet scan (ReadSchema 2 → 1).
    return toks.select("doc_id").join(per, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_shingles"), F.lit(0).cast("bigint")).alias(
            "n_shingles"
        ),
        F.coalesce(F.col("n_shared"), F.lit(0).cast("bigint")).alias("n_shared"),
        F.try_divide(
            F.col("n_shared").cast("double"), F.col("n_shingles")
        ).alias("shared_fraction"),
    )


# ---- training-chunk windowing ---------------------------------------------

_CHUNK_W = 32  # window size (tokens)
_CHUNK_S = 24  # stride (tokens) — W > S gives 8-token overlap


@register(
    "text_chunk_windows",
    "text",
    doc="context-window chunking for training: each document splits into "
    f"overlapping token windows (size {_CHUNK_W}, stride {_CHUNK_S}) — "
    "the standard pre-tokenization step before sequence packing "
    "(pipeline_pack_shards is the complementary op).  Entirely row-local: "
    "sequence + explode + slice, zero shuffle at any corpus scale; chunk "
    "count per doc is ceil(n_tokens/stride), so output is a constant "
    "factor of input tokens, never quadratic.  chunk_hash (md5 over the "
    "space-joined window) gives downstream exact-dedup a ready key.",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, {_TOKS_SQL} AS toks FROM documents
        ), c AS (
            SELECT doc_id, toks,
                   unnest(range(0, CAST(ceil(len(toks) / {_CHUNK_S}.0) AS BIGINT)))
                       AS chunk_id
            FROM t WHERE len(toks) > 0
        )
        SELECT doc_id,
               CAST(chunk_id AS INT) AS chunk_id,
               CAST(chunk_id * {_CHUNK_S} AS INT) AS start_tok,
               CAST(least({_CHUNK_W}, len(toks) - chunk_id * {_CHUNK_S}) AS INT)
                   AS n_chunk_tokens,
               md5(array_to_string(
                   toks[chunk_id * {_CHUNK_S} + 1 : chunk_id * {_CHUNK_S} + {_CHUNK_W}],
                   ' ')) AS chunk_hash
        FROM c
    """,
)
def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    toked = docs.select(
        "doc_id", tokens(F.col("text")).alias("toks")
    ).filter(F.size("toks") > 0)
    n = F.size("toks")
    chunked = toked.select(
        "doc_id",
        "toks",
        F.explode(
            F.sequence(
                F.lit(0), F.ceil(n / float(_CHUNK_S)).cast("int") - 1
            )
        ).alias("chunk_id"),
    )
    start = F.col("chunk_id") * _CHUNK_S
    window_toks = F.slice(F.col("toks"), start + 1, _CHUNK_W)
    return chunked.select(
        "doc_id",
        F.col("chunk_id").cast("int").alias("chunk_id"),
        start.cast("int").alias("start_tok"),
        F.least(F.lit(_CHUNK_W), F.size("toks") - start)
        .cast("int")
        .alias("n_chunk_tokens"),
        F.md5(F.concat_ws(" ", window_toks).cast("binary")).alias("chunk_hash"),
    )


_SPLIT_TRAIN_LT = 205  # of 256: ~80.1% train
_SPLIT_VAL_LT = 230  # next ~9.8% val, remainder ~10.2% test


@register(
    "pipeline_train_split_chunks",
    "text",
    doc="leak-safe train/val/test assignment propagated to chunk level: "
    "the split is a pure function of doc_id (first byte of "
    f"md5(doc_id) against {_SPLIT_TRAIN_LT}/{_SPLIT_VAL_LT} of 256 — "
    "~80/10/10), so every window text_chunk_windows derives from a "
    "document lands in exactly ONE split by construction — the "
    "standard guard against sibling-chunk leakage between train and "
    "eval.  Deliberately keyed on the stable id, not content: an edited "
    "document must stay in its split (content-keyed assignment migrates "
    "rows between splits on every revision, silently contaminating "
    "eval).  Row-local assignment — no join, no extra shuffle; the "
    "only shuffle is the final 3-row stats aggregate, so at 100 TB "
    "this is a map over the chunk stream.  Output: per-split doc, "
    "chunk and token counts (the numbers a training run budgets "
    "from).",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, {_TOKS_SQL} AS toks FROM documents
        ), c AS (
            SELECT doc_id, toks,
                   unnest(range(0, CAST(ceil(len(toks) / {_CHUNK_S}.0) AS BIGINT)))
                       AS chunk_id
            FROM t WHERE len(toks) > 0
        ), ch AS (
            SELECT doc_id,
                   CAST(least({_CHUNK_W}, len(toks) - chunk_id * {_CHUNK_S})
                        AS BIGINT) AS n_chunk_tokens,
                   CASE
                     WHEN {_hexbyte_sql("md5(CAST(doc_id AS VARCHAR))", 0)}
                          < {_SPLIT_TRAIN_LT} THEN 'train'
                     WHEN {_hexbyte_sql("md5(CAST(doc_id AS VARCHAR))", 0)}
                          < {_SPLIT_VAL_LT} THEN 'val'
                     ELSE 'test'
                   END AS split
            FROM c
        )
        SELECT split,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
               CAST(COUNT(*) AS BIGINT) AS n_chunks,
               CAST(SUM(n_chunk_tokens) AS BIGINT) AS n_tokens
        FROM ch GROUP BY split
    """,
)
def pipeline_train_split_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arrow_experiments_spark.functions.text import md5_str

    chunks = text_chunk_windows(spark, sf_dir)
    first_byte = F.conv(
        F.substring(md5_str(F.col("doc_id").cast("string")), 1, 2), 16, 10
    ).cast("int")
    split = (
        F.when(first_byte < _SPLIT_TRAIN_LT, F.lit("train"))
        .when(first_byte < _SPLIT_VAL_LT, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        chunks.withColumn("split", split)
        .groupBy("split")
        .agg(
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
            F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
            F.sum("n_chunk_tokens").cast("bigint").alias("n_tokens"),
        )
    )


# ---- incremental corpus refresh -------------------------------------------


@register(
    "pipeline_snapshot_upsert",
    "text",
    doc="CDC-style incremental corpus refresh: a delta feed (every 10th "
    "document revised — version 2, re-counted chars) merges into the "
    "base snapshot, latest version per doc_id winning.  The merge is "
    "union + one row_number window keyed on doc_id — a single shuffle "
    "proportional to base+delta; at 100 TB the snapshot is partitioned "
    "(hash(doc_id) or ingest-date) so the delta join touches only "
    "matching partitions (merge-on-read posture).  The delta is derived "
    "deterministically from the same table so both engines see an "
    "identical feed.",
    oracle="""
        WITH base AS (
            SELECT doc_id, CAST(1 AS INT) AS version, n_chars FROM documents
        ), delta AS (
            SELECT doc_id, CAST(2 AS INT) AS version,
                   n_chars + 7 AS n_chars
            FROM documents WHERE doc_id % 10 = 0
        ), merged AS (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                         ORDER BY version DESC) AS rn
            FROM (SELECT * FROM base UNION ALL SELECT * FROM delta)
        )
        SELECT doc_id, version, n_chars,
               version = 2 AS is_updated
        FROM merged WHERE rn = 1
    """,
)
def pipeline_snapshot_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id", F.lit(1).cast("int").alias("version"), "n_chars"
    )
    delta = docs.filter(F.col("doc_id") % 10 == 0).select(
        "doc_id",
        F.lit(2).cast("int").alias("version"),
        (F.col("n_chars") + 7).alias("n_chars"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("version").desc())
    return (
        base.unionByName(delta)
        .select("*", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            "version",
            "n_chars",
            (F.col("version") == 2).alias("is_updated"),
        )
    )


# ---- adaptive quality gate ------------------------------------------------


@register(
    "pipeline_quality_gate_quantile",
    "text",
    doc="adaptive quality gate: keep documents at or above the corpus "
    "25th percentile of whitespace-token count — the threshold is "
    "DERIVED from the corpus (one exact-percentile aggregate, snapped to "
    "6 decimals for interpolation-ulp parity), broadcast as a 1-row "
    "frame, and applied map-side.  Contrast with pipeline_training_"
    "select's fixed thresholds: this is the shape used when the quality "
    "bar must track a drifting corpus.  At 100 TB the exact percentile "
    "becomes approx_percentile (same plan, sketch partials) and nothing "
    "else changes.",
    oracle="""
        WITH t AS (
            SELECT doc_id,
                   CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
                                        x -> x <> '')) AS BIGINT) AS n_tokens
            FROM documents
        ), thr AS (
            SELECT CAST(CAST(quantile_cont(n_tokens, 0.25) AS DECIMAL(28,6))
                        AS DOUBLE) AS p25
            FROM t
        )
        SELECT doc_id, n_tokens, p25
        FROM t CROSS JOIN thr
        WHERE n_tokens >= p25
    """,
)
def pipeline_quality_gate_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    toked = docs.select(
        "doc_id",
        F.size(tokens(F.col("text"))).cast("bigint").alias("n_tokens"),
    )
    thr = toked.agg(
        F.expr("percentile(n_tokens, 0.25)")
        .cast("decimal(28,6)")
        .cast("double")
        .alias("p25")
    )
    return toked.crossJoin(F.broadcast(thr)).filter(
        F.col("n_tokens") >= F.col("p25")
    )


@register(
    "text_lang_confusion",
    "text",
    doc="classifier-evaluation confusion matrix: the text_language_id "
    "heuristic's prediction crossed with the labeled lang column — "
    "counts plus the share of each label's rows per prediction.  The "
    "matrix is (labels x predictions) rows, bounded by construction; "
    "one shuffle.  This is the eval op a curation pipeline runs on a "
    "labeled sample before trusting a cheap classifier at 100 TB (the "
    "text analog of ann_recall_eval).",
    oracle=f"""
        WITH t AS (SELECT doc_id, lang, {_TOKS_SQL} AS toks FROM documents),
        pred AS (
            SELECT lang,
                   CASE WHEN CAST(len(list_filter(toks, x -> list_contains({_SW_SQL}, x))) AS DOUBLE)
                             / NULLIF(len(toks), 0) >= 0.05
                        THEN 'en_like' ELSE 'other' END AS predicted
            FROM t
        ), m AS (
            SELECT lang, predicted, COUNT(*) AS n FROM pred GROUP BY 1, 2
        ), tot AS (
            SELECT lang, SUM(n) AS label_total FROM m GROUP BY 1
        )
        SELECT m.lang, m.predicted, m.n,
               CAST(m.n AS DOUBLE) / tot.label_total AS label_share
        FROM m JOIN tot USING (lang)
    """,
)
def text_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    sw = F.array(*[F.lit(w) for w in _EN_STOPWORDS])
    toks = tokens(F.col("text"))
    hits = F.size(F.filter(toks, lambda x: F.array_contains(sw, x)))
    ratio = F.try_divide(hits.cast("double"), F.size(toks))
    pred = (
        table(spark, sf_dir, "documents")
        .select(
            "lang",
            F.when(ratio >= 0.05, "en_like").otherwise("other").alias(
                "predicted"
            ),
        )
    )
    m = pred.groupBy("lang", "predicted").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("lang")
    return m.select(
        "lang",
        "predicted",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(w)).alias("label_share"),
    )


@register(
    "text_dedup_chunk_exact",
    "text",
    doc="passage-level exact dedup, composed from the chunker: "
    "text_chunk_windows' chunk hashes grouped to (canonical chunk, copy "
    "count, distinct docs) — the C4-style duplicate-passage removal step "
    "that document-level exact dedup misses (shared boilerplate inside "
    "otherwise-distinct documents).  Chunking is row-local; the dedup is "
    "one shuffle on chunk_hash, identical in shape to dedup_exact, so "
    "the 100 TB posture is the same.",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, {_TOKS_SQL} AS toks FROM documents
        ), c AS (
            SELECT doc_id, toks,
                   unnest(range(0, CAST(ceil(len(toks) / {_CHUNK_S}.0) AS BIGINT)))
                       AS chunk_id
            FROM t WHERE len(toks) > 0
        ), h AS (
            SELECT doc_id,
                   md5(array_to_string(
                       toks[chunk_id * {_CHUNK_S} + 1 : chunk_id * {_CHUNK_S} + {_CHUNK_W}],
                       ' ')) AS chunk_hash
            FROM c
        )
        SELECT chunk_hash,
               MIN(doc_id) AS canonical_doc,
               CAST(COUNT(*) AS BIGINT) AS n_copies,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
        FROM h GROUP BY chunk_hash
    """,
)
def text_dedup_chunk_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    chunks = text_chunk_windows(spark, sf_dir)
    return chunks.groupBy("chunk_hash").agg(
        F.min("doc_id").alias("canonical_doc"),
        F.count(F.lit(1)).cast("bigint").alias("n_copies"),
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
    )


@register(
    "pipeline_dedup_incremental",
    "text",
    doc="incremental-ingest dedup: a delta feed (every 10th document, the "
    "same deterministic derivation as pipeline_snapshot_upsert) admits "
    "only documents whose content hash is UNSEEN in the base corpus — a "
    "left-anti join on md5(text), the 'have we ingested this before' "
    "gate every continuously-fed training corpus runs before paying "
    "near-dup costs.  One shuffle keyed on the hash; at 100 TB the base "
    "side is a bucketed-by-hash fingerprint table so the anti-join "
    "co-locates without reshuffling the corpus.",
    oracle="""
        WITH delta AS (
            SELECT doc_id, md5(text) AS content_hash, n_chars
            FROM documents WHERE doc_id % 10 = 0
        ), base AS (
            SELECT DISTINCT md5(text) AS content_hash
            FROM documents WHERE doc_id % 10 <> 0
        )
        SELECT d.doc_id, d.content_hash, d.n_chars
        FROM delta d
        WHERE NOT EXISTS (SELECT 1 FROM base b
                          WHERE b.content_hash = d.content_hash)
    """,
)
def pipeline_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arrow_experiments_spark.functions.text import md5_str

    docs = table(spark, sf_dir, "documents")
    delta = docs.filter(F.col("doc_id") % 10 == 0).select(
        "doc_id", md5_str(F.col("text")).alias("content_hash"), "n_chars"
    )
    base = docs.filter(F.col("doc_id") % 10 != 0).select(
        md5_str(F.col("text")).alias("content_hash")
    )
    return delta.join(base, "content_hash", "left_anti")


# The full curation funnel as ONE registered row.  CTE fragments are the
# same ones the stage queries use: the recursive LSH-component chain from
# dedup (_COMP_CTES), this module's tokenizer/stopword SQL.
from arrow_experiments_spark.operators.dedup import _COMP_CTES as _DEDUP_COMP_CTES
from arrow_experiments_spark.operators.dedup import (
    _AGREE_SQL,
    _minhash_bands_sql,
)

_NEARDUP_MIN_AGREE = 4  # ceil(0.5 * 8 sigs) — incremental_neardup_sink default


@register(
    "pipeline_neardup_incremental",
    "text",
    doc="incremental-ingest NEAR-dup gate — the batch twin of "
    "streaming/egress.py's incremental_neardup_sink: the delta feed "
    "(every 10th document) admits only documents that are (a) exact-"
    "unseen (hash anti-join, pipeline_dedup_incremental's gate) AND "
    "(b) not a near-duplicate of any base document — candidates from "
    "the MinHash band equi-join (delta bands probe base bands; at "
    "100 TB the base side is the persisted band INDEX, bucketed on the "
    "band value so the probe prunes), verified by signature agreement "
    ">= 4 of 8 (dedup_minhash_estimate's estimator, J_est >= 0.5) — "
    "ZERO re-tokenization of the base corpus.  One signature pass over "
    "all docs shared by the band and verify stages; shuffles: the hash "
    "anti-join + the band equi-join, both delta-bounded on the probe "
    "side.",
    oracle=_minhash_bands_sql()
    + f"""
        , delta AS (
            SELECT doc_id, md5(text) AS content_hash, n_chars
            FROM documents WHERE doc_id % 10 = 0
        ), base AS (
            SELECT DISTINCT md5(text) AS content_hash
            FROM documents WHERE doc_id % 10 <> 0
        ), near AS (
            SELECT DISTINCT a.doc_id
            FROM bands a
            JOIN bands b ON a.band_idx = b.band_idx
                        AND a.band_val = b.band_val
                        AND a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0
            JOIN sigs x ON x.doc_id = a.doc_id
            JOIN sigs y ON y.doc_id = b.doc_id
            WHERE {_AGREE_SQL} >= {_NEARDUP_MIN_AGREE}
        )
        SELECT d.doc_id, d.content_hash, d.n_chars
        FROM delta d
        WHERE NOT EXISTS (SELECT 1 FROM base b
                          WHERE b.content_hash = d.content_hash)
          AND NOT EXISTS (SELECT 1 FROM near n
                          WHERE n.doc_id = d.doc_id)
    """,
)
def pipeline_neardup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arrow_experiments_spark.functions.text import md5_str
    from arrow_experiments_spark.operators.dedup import (
        _AGREE_AB_SQL,
        _minhash_bands_carrying_sigs,
        _minhash_sigs,
    )

    from arrow_experiments_spark.functions.text import shingles3, tokens

    docs = table(spark, sf_dir, "documents")
    is_delta = F.col("doc_id") % 10 == 0
    # ONE scan of the corpus (r16): content hash and tokens come out of
    # the same persisted projection — previously the hash gate and the
    # signature pass each re-read the documents table.  At 100 TB the
    # corpus read is the dominant cost, so the gate pays it once.
    scan = (
        widen_if_narrow(docs, spark, sf_dir, "documents")
        .select(
            "doc_id",
            md5_str(F.col("text")).alias("content_hash"),
            "n_chars",
            tokens(F.col("text")).alias("toks"),
        )
        .persist()
    )
    hashed = scan.select("doc_id", "content_hash", "n_chars")
    delta = hashed.filter(is_delta)
    base_hashes = hashed.filter(~is_delta).select("content_hash").distinct()
    exact_novel = delta.join(base_hashes, "content_hash", "left_anti")

    # one signature pass shared by the band join and the agreement
    # verify, derived from the same persisted scan (corpus= carries the
    # shingle sets — no second tokenize)
    sh = scan.select(
        "doc_id", F.array_distinct(shingles3(F.col("toks"))).alias("sh")
    ).persist()
    sigs = _minhash_sigs(spark, sf_dir, corpus=sh)
    # signatures ride through the band join (r16, session 2 — see
    # dedup_minhash_estimate): the agreement verify runs on the
    # collision row itself, so the sigs-table join-back (x on did, y on
    # bid — four exchanges) and the intermediate (did, bid) distinct
    # both disappear; a pair passing the threshold in any collision row
    # passes in all (same signatures), so distinct-on-did after the
    # filter yields the identical near set.
    bands = _minhash_bands_carrying_sigs(sigs)
    # The per-doc distinct STAYS (r17, examined and kept): the anti join
    # tolerates duplicates, but without the distinct the near set is one
    # row per COLLISION (bands × matching base docs — unbounded in dup
    # density) instead of one per flagged delta doc, and the distinct's
    # exchange is reused by the anti join anyway (A/B: timing wash at
    # sf0.1, identical exchange counts, worse sort volume at scale).
    near = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") % 10 == 0)
            & (F.col("b.doc_id") % 10 != 0),
        )
        .selectExpr("a.doc_id AS doc_id", f"{_AGREE_AB_SQL} AS n_agree_i")
        .filter(F.col("n_agree_i") >= _NEARDUP_MIN_AGREE)
        .select("doc_id")
        .distinct()
    )
    return exact_novel.join(near, "doc_id", "left_anti").select(
        "doc_id", "content_hash", "n_chars"
    )


@register(
    "pipeline_curate_incremental_full",
    "text",
    doc="the FULL curation funnel at ingest — the batch twin of "
    "streaming/egress.py's composed incremental_neardup_sink("
    "eval_docs=...): the delta feed (every 10th TRAINING document; "
    "source src0 is the benchmark set, never ingested) admits only "
    "documents that are (a) exact-unseen vs the base training corpus "
    "(hash anti-join), (b) not a near-duplicate of any base training "
    "doc (MinHash band candidates verified by signature agreement >= "
    "4 of 8 — pipeline_neardup_incremental's gate verbatim), AND (c) "
    "not CONTAMINATED: sharing >= 3 distinct 3-word shingles with any "
    "single eval doc (decontaminate_ngram_overlap's stage operator, "
    "composed not reimplemented).  At 100 TB: the base side of (a)/(b) "
    "is the sink's persisted bucketed snapshot/index probed at touched "
    "buckets only; (c) is delta x broadcast eval index — the benchmark "
    "set is KBs against TBs of stream.  One signature pass; every "
    "probe delta-bounded.",
    oracle=_minhash_bands_sql(", source")
    + f"""
        , delta AS (
            SELECT doc_id, md5(text) AS content_hash, n_chars
            FROM documents WHERE doc_id % 10 = 0 AND source <> 'src0'
        ), base AS (
            SELECT DISTINCT md5(text) AS content_hash
            FROM documents WHERE doc_id % 10 <> 0 AND source <> 'src0'
        ), near AS (
            SELECT DISTINCT a.doc_id
            FROM bands a
            JOIN bands b ON a.band_idx = b.band_idx
                        AND a.band_val = b.band_val
                        AND a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0
            JOIN sh_t sa ON sa.doc_id = a.doc_id AND sa.source <> 'src0'
            JOIN sh_t sb ON sb.doc_id = b.doc_id AND sb.source <> 'src0'
            JOIN sigs x ON x.doc_id = a.doc_id
            JOIN sigs y ON y.doc_id = b.doc_id
            WHERE {_AGREE_SQL} >= {_NEARDUP_MIN_AGREE}
        ), ev AS (
            SELECT t.doc_id AS eval_id, unnest(t.sh) AS s
            FROM sh_t t WHERE t.source = 'src0'
        ), dtr AS (
            SELECT t.doc_id AS train_id, unnest(t.sh) AS s
            FROM sh_t t WHERE t.doc_id % 10 = 0 AND t.source <> 'src0'
        ), contaminated AS (
            SELECT DISTINCT train_id AS doc_id FROM (
                SELECT train_id, eval_id
                FROM dtr JOIN ev USING (s)
                GROUP BY train_id, eval_id
                HAVING COUNT(*) >= 3
            )
        )
        SELECT d.doc_id, d.content_hash, d.n_chars
        FROM delta d
        WHERE NOT EXISTS (SELECT 1 FROM base b
                          WHERE b.content_hash = d.content_hash)
          AND NOT EXISTS (SELECT 1 FROM near n
                          WHERE n.doc_id = d.doc_id)
          AND NOT EXISTS (SELECT 1 FROM contaminated c
                          WHERE c.doc_id = d.doc_id)
    """,
)
def pipeline_curate_incremental_full(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from arrow_experiments_spark.functions.text import md5_str
    from arrow_experiments_spark.operators.dedup import (
        _AGREE_AB_SQL,
        _minhash_bands_carrying_sigs,
        _minhash_sigs,
        decontaminate_ngram_overlap,
    )

    from arrow_experiments_spark.functions.text import shingles3, tokens

    docs = table(spark, sf_dir, "documents")
    is_delta = F.col("doc_id") % 10 == 0
    is_train = F.col("source") != "src0"
    # ONE scan of the corpus (r16): hash, tokens and source come out of a
    # single persisted projection feeding the exact gate, the signature
    # pass AND the decontamination stage — previously three separate
    # reads (and two separate tokenize passes) of the documents table.
    scan = (
        widen_if_narrow(docs, spark, sf_dir, "documents")
        .select(
            "doc_id",
            "source",
            md5_str(F.col("text")).alias("content_hash"),
            "n_chars",
            tokens(F.col("text")).alias("toks"),
        )
        .persist()
    )
    hashed = scan.filter(is_train).select("doc_id", "content_hash", "n_chars")
    delta = hashed.filter(is_delta)
    base_hashes = hashed.filter(~is_delta).select("content_hash").distinct()
    exact_novel = delta.join(base_hashes, "content_hash", "left_anti")

    sh = scan.select(
        "doc_id",
        "source",
        F.array_distinct(shingles3(F.col("toks"))).alias("sh"),
    ).persist()
    # Signatures only for TRAINING docs: the band join below filters both
    # sides to train (tbands), so src0 signatures were computed and then
    # dropped — restricting the input is result-identical and removes the
    # post-hoc train filter join.
    sigs = _minhash_sigs(spark, sf_dir, corpus=sh.filter(is_train))
    # signatures ride through the band join (r16, session 2 — see
    # dedup_minhash_estimate / pipeline_neardup_incremental)
    tbands = _minhash_bands_carrying_sigs(sigs)
    # The per-doc distincts STAY (r17, examined and kept): the anti
    # joins tolerate duplicates, but without them the near set is one
    # row per collision (unbounded in dup density) and the contaminated
    # set one per matching eval doc, instead of one per flagged doc —
    # and each distinct's exchange is reused by its anti join anyway
    # (A/B: timing wash at sf0.1, identical exchange counts, worse sort
    # volume at scale).
    near = (
        tbands.alias("a")
        .join(
            tbands.alias("b"),
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") % 10 == 0)
            & (F.col("b.doc_id") % 10 != 0),
        )
        .selectExpr("a.doc_id AS doc_id", f"{_AGREE_AB_SQL} AS n_agree_i")
        .filter(F.col("n_agree_i") >= _NEARDUP_MIN_AGREE)
        .select("doc_id")
        .distinct()
    )
    # the decontamination STAGE operator, composed verbatim (its eval
    # side is the broadcast src0 inverted index).  Its corpus is the
    # shared scan RESTRICTED to src0 ∪ the delta training docs (r16):
    # the composite only consults the contaminated set for delta rows
    # (exact_novel ⊆ delta), so flagging base training docs was pure
    # waste — at 100 TB this turns an all-corpus explode+join into a
    # delta-bounded one, the same O(delta) posture as the other gates.
    contaminated = (
        decontaminate_ngram_overlap(
            spark, sf_dir, corpus=sh.filter(~is_train | is_delta)
        )
        .select(F.col("train_id").alias("doc_id"))
        .distinct()
    )
    return (
        exact_novel.join(near, "doc_id", "left_anti")
        .join(contaminated, "doc_id", "left_anti")
        .select("doc_id", "content_hash", "n_chars")
    )


@register(
    "pipeline_curate_end_to_end",
    "text",
    doc="THE training-data curation job, end to end, as one query: "
    "per-source funnel counts through (1) quality gating (>= 20 tokens, "
    "distinct ratio >= 0.4, stopword ratio >= 0.05 — the "
    "pipeline_training_select thresholds), (2) near-dup canonicalization "
    "(doc survives iff it is its LSH cluster's canonical — "
    "dedup_keep_canonical over the full corpus), and (3) decontamination "
    "(drop any training doc sharing >= 3 shingles with an eval doc; eval "
    "= source src0, which is excluded from the training funnel "
    "entirely).  Output: source, n_docs, n_quality, n_canonical, "
    "n_selected — the monotone funnel a curation run reports.  Composes "
    "the registered stage operators verbatim (their builders are called, "
    "not reimplemented), so stage semantics can never drift between the "
    "observable stages and the composite.  SINGLE-SCAN: all three stages "
    "share one persisted curate_corpus frame (quality scalars + shingle "
    "sets from one tokenize pass) threaded through the stage builders' "
    "corpus= parameter — the corpus is read and tokenized exactly once.  "
    "Scale shape: quality is row-local; the dedup and decontamination "
    "shuffles are the audited stage plans; the final regroup is #sources "
    "rows.",
    oracle=_DEDUP_COMP_CTES
    + f"""
        , ranked AS (
            SELECT c.cluster_id, c.doc_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY c.cluster_id
                       ORDER BY LENGTH(d.text) DESC, c.doc_id
                   ) AS rn
            FROM comp c JOIN documents d USING (doc_id)
        ), kept AS (
            SELECT doc_id FROM ranked WHERE rn = 1
        ), tq AS (
            SELECT doc_id, source, {_TOKS_SQL} AS toks
            FROM documents WHERE source <> 'src0'
        ), q AS (
            SELECT doc_id, source,
                   (len(toks) >= 20
                    AND CAST(len(list_distinct(toks)) AS DOUBLE)
                        / NULLIF(len(toks), 0) >= 0.4
                    AND CAST(len(list_filter(toks,
                            x -> list_contains({_SW_SQL}, x))) AS DOUBLE)
                        / NULLIF(len(toks), 0) >= 0.05) AS ok
            FROM tq
        ), ev AS (
            SELECT t.doc_id AS eval_id, unnest(t.sh) AS s
            FROM sh_t t JOIN documents d USING (doc_id)
            WHERE d.source = 'src0'
        ), tr AS (
            SELECT t.doc_id AS train_id, unnest(t.sh) AS s
            FROM sh_t t JOIN documents d USING (doc_id)
            WHERE d.source <> 'src0'
        ), decon_pairs AS (
            SELECT train_id, eval_id
            FROM tr JOIN ev USING (s)
            GROUP BY train_id, eval_id
            HAVING COUNT(*) >= 3
        ), flagged AS (
            SELECT DISTINCT train_id AS doc_id FROM decon_pairs
        )
        SELECT q.source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN q.ok THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_quality,
               CAST(SUM(CASE WHEN q.ok AND k.doc_id IS NOT NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_canonical,
               CAST(SUM(CASE WHEN q.ok AND k.doc_id IS NOT NULL
                                  AND f.doc_id IS NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_selected
        FROM q
        LEFT JOIN kept k ON k.doc_id = q.doc_id
        LEFT JOIN flagged f ON f.doc_id = q.doc_id
        GROUP BY q.source
    """,
)
def pipeline_curate_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arrow_experiments_spark.operators.dedup import (
        curate_corpus,
        decontaminate_flags,
        dedup_keep_canonical,
        release_curate_tokens,
    )

    # SINGLE-SCAN: one persisted (doc_id, source, text_len, n_tokens, dr,
    # sr, sh) frame feeds all three stages — quality reads the scalars,
    # canonicalization and decontamination read the shared shingle sets —
    # instead of each stage re-reading and re-tokenizing the corpus (the
    # dominant cost at 100 TB; was 3× the single funnel pass).
    # defer_materialize (r17): the eager count() job is fused into the
    # cluster edge collect below — the composite's first action fills
    # the cache either way, so the separate count was one whole
    # scheduled job of pure overhead on the critical path.
    corpus = curate_corpus(spark, sf_dir, defer_materialize=True)
    scored = corpus.filter(F.col("source") != "src0").select(
        "doc_id", "source", "n_tokens", "dr", "sr"
    )
    qual = (
        (F.col("n_tokens") >= 20) & (F.col("dr") >= 0.4) & (F.col("sr") >= 0.05)
    )
    kept = dedup_keep_canonical(spark, sf_dir, corpus=corpus).select(
        F.col("kept_doc_id").alias("doc_id"), F.lit(1).alias("is_canon")
    )
    # the edge collect inside keep_canonical materialized the corpus —
    # release the parked token-stage persist (falls back to an explicit
    # count if the collect was conf-disabled; see release_curate_tokens)
    release_curate_tokens(spark, sf_dir)
    flagged = decontaminate_flags(spark, sf_dir, corpus=corpus).select(
        F.col("train_id").alias("doc_id"), F.lit(1).alias("is_flagged")
    )
    staged = (
        scored.withColumn("q", qual)
        .join(kept, "doc_id", "left")
        .join(flagged, "doc_id", "left")
    )
    return staged.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.count_if(F.col("q")).cast("bigint").alias("n_quality"),
        F.count_if(F.col("q") & F.col("is_canon").isNotNull())
        .cast("bigint")
        .alias("n_canonical"),
        F.count_if(
            F.col("q")
            & F.col("is_canon").isNotNull()
            & F.col("is_flagged").isNull()
        )
        .cast("bigint")
        .alias("n_selected"),
    )
