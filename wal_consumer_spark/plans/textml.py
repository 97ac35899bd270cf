"""Text-ML pipeline queries (SURVEY.md §2.B "LLM extensions": tokenize,
stop-words, tf-idf, n-grams, lexicon sentiment). All pure DataFrame ops —
token explode is the map side, aggregations shuffle on (doc|term) keys only,
so every plan scales linearly with corpus size. Each query carries a DuckDB
oracle that replays the identical rule.

Reference parity note: the reference (sahabpardaz/wal-consumer) has no text
processing at all — this whole module is the declared extension surface
(SURVEY.md §2.B), not a port.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from wal_consumer_spark.operators.broadcast import maybe_broadcast
from wal_consumer_spark.operators.partitioning import spread_small_input
from wal_consumer_spark.functions.text import LANG_LEXICONS, tokens, word_shingles
from wal_consumer_spark.plans.registry import register
from wal_consumer_spark.sources.tables import load_table

#: DuckDB fragment matching functions.text.tokens()
_TOKS = r"string_split_regex(lower(trim(text)), '\s+')"
#: DuckDB fragment matching word_shingles(k=2) (distinct per-doc bigrams)
_BIGRAMS = (
    "list_distinct(list_transform(generate_series(0, greatest(len({t}) - 2, 0)), "
    "i -> array_to_string(list_slice({t}, i + 1, i + 2), ' ')))"
).format(t=_TOKS)

#: tiny fixed sentiment lexicons so the oracle replays the exact rule
POS_WORDS: tuple[str, ...] = ("good", "great", "best", "new", "first", "well", "like")
NEG_WORDS: tuple[str, ...] = ("no", "not", "never", "bad", "worst", "against", "down")


@register(
    "text_tfidf_topk",
    oracle=f"""
    WITH tf AS (
        SELECT doc_id, term, COUNT(*) AS tf
        FROM (SELECT doc_id, unnest({_TOKS}) AS term FROM documents)
        GROUP BY doc_id, term
    ),
    df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT doc_id, term, tf,
           round(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf, rnk
    FROM (
        SELECT tf.doc_id, tf.term, tf.tf, df.df, n.n_docs,
               row_number() OVER (
                   PARTITION BY tf.doc_id
                   ORDER BY tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df) DESC, tf.term
               ) AS rnk
        FROM tf JOIN df USING (term) CROSS JOIN n
    ) WHERE rnk <= 3
    """,
    doc="TF-IDF top-3 terms per document: token explode -> (doc,term) counts "
        "-> doc-frequency join -> per-doc rank. The df side is vocab-sized: "
        "broadcast while Catalyst's estimate fits (maybe_broadcast), shuffled "
        "at billion-term scale; the only big shuffle is the (doc,term) count.",
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    terms = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    n_docs = d.count()  # scalar; corpus size is a metadata lookup at scale
    scored = tf.join(maybe_broadcast(df_), "term").withColumn(
        "tfidf_raw", F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf_raw").desc(), F.col("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "term", "tf", F.round("tfidf_raw", 6).alias("tfidf"), "rnk")
    )


@register(
    "text_bigram_df",
    oracle=f"""
    SELECT bigram, COUNT(*) AS n_docs
    FROM (SELECT doc_id, unnest({_BIGRAMS}) AS bigram FROM documents)
    GROUP BY bigram
    HAVING COUNT(*) >= 3
    ORDER BY n_docs DESC, bigram
    LIMIT 20
    """,
    doc="Top-20 word bigrams by document frequency (distinct per doc), the "
        "n-gram building block; count shuffles on the bigram key only.",
)
def text_bigram_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    bg = d.select(
        F.explode(word_shingles(tokens(F.col("text")), k=2)).alias("bigram")
    )
    return (
        bg.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= 3)
        .orderBy(F.col("n_docs").desc(), "bigram")
        .limit(20)
    )


@register(
    "text_stopword_filter",
    oracle=f"""
    SELECT doc_id,
           len({_TOKS}) AS n_tokens,
           len(list_filter({_TOKS},
               t -> NOT list_contains({list(LANG_LEXICONS["en"])!r}, t))) AS n_content_tokens,
           md5(array_to_string(list_filter({_TOKS},
               t -> NOT list_contains({list(LANG_LEXICONS["en"])!r}, t)), ' ')) AS content_fp
    FROM documents
    """,
    doc="Stop-word removal: per-doc token counts before/after filtering the "
        "English lexicon, plus a fingerprint of the filtered stream (arrays "
        "stay out of the output so the value-hash is engine-neutral).",
)
def text_stopword_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    lex = F.array(*[F.lit(w) for w in LANG_LEXICONS["en"]])
    tok = tokens(F.col("text"))
    kept = F.filter(tok, lambda t: ~F.array_contains(lex, t))
    return d.select(
        "doc_id",
        F.size(tok).cast("long").alias("n_tokens"),
        F.size(kept).cast("long").alias("n_content_tokens"),
        F.md5(F.array_join(kept, " ")).alias("content_fp"),
    )


@register(
    "text_sentiment_lexicon",
    oracle=f"""
    SELECT doc_id, pos_hits, neg_hits,
           round((pos_hits - neg_hits) / greatest(n_tokens, 1), 6) AS polarity,
           CASE WHEN pos_hits > neg_hits THEN 'pos'
                WHEN neg_hits > pos_hits THEN 'neg'
                ELSE 'neutral' END AS label
    FROM (
        SELECT doc_id,
               len({_TOKS}) AS n_tokens,
               len(list_filter({_TOKS}, t -> list_contains({list(POS_WORDS)!r}, t))) AS pos_hits,
               len(list_filter({_TOKS}, t -> list_contains({list(NEG_WORDS)!r}, t))) AS neg_hits
        FROM documents
    )
    """,
    doc="Lexicon sentiment scoring (EDBT-2016 Spark sentiment pattern, "
        "PAPERS.md): positive/negative hit counts -> polarity in [-1, 1] "
        "and a 3-way label. Pure map-side expression, no shuffle.",
)
def text_sentiment_lexicon(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tok = tokens(F.col("text"))
    pos_lex = F.array(*[F.lit(w) for w in POS_WORDS])
    neg_lex = F.array(*[F.lit(w) for w in NEG_WORDS])
    scored = d.select(
        "doc_id",
        F.size(tok).cast("long").alias("n_tokens"),
        F.size(F.filter(tok, lambda t: F.array_contains(pos_lex, t))).cast("long").alias("pos_hits"),
        F.size(F.filter(tok, lambda t: F.array_contains(neg_lex, t))).cast("long").alias("neg_hits"),
    )
    return scored.select(
        "doc_id",
        "pos_hits",
        "neg_hits",
        F.round(
            (F.col("pos_hits") - F.col("neg_hits")) / F.greatest(F.col("n_tokens"), F.lit(1)), 6
        ).alias("polarity"),
        F.when(F.col("pos_hits") > F.col("neg_hits"), "pos")
        .when(F.col("neg_hits") > F.col("pos_hits"), "neg")
        .otherwise("neutral")
        .alias("label"),
    )


@register(
    "text_unigram_logprob",
    oracle=f"""
    WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS t FROM documents),
    vocab AS (SELECT t, COUNT(*) AS n FROM tok GROUP BY t),
    tot AS (SELECT CAST(SUM(n) AS DOUBLE) AS total FROM vocab)
    SELECT doc_id,
           COUNT(*) AS n_tokens,
           round(CAST(SUM(CAST(round(-ln(n / total) * 1000000) AS BIGINT))
                      AS DOUBLE) / 1000000 / COUNT(*), 6) AS avg_neg_logprob
    FROM tok JOIN vocab USING (t) CROSS JOIN tot
    GROUP BY doc_id
    """,
    doc="Unigram LM quality score (the CCNet-style perplexity-filter "
        "primitive, with the corpus itself as the LM): per-doc average "
        "negative log-probability of its tokens under corpus-wide unigram "
        "frequencies. The vocab side is O(|vocab|) and broadcast; the only "
        "corpus-sized shuffle is the (doc, token) re-aggregation. At "
        "100 TB the vocab table is computed once per corpus snapshot and "
        "reused across scoring runs.",
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("t"))
    vocab = tok.groupBy("t").agg(F.count(F.lit(1)).alias("n"))
    total = vocab.agg(F.sum("n").cast("double").alias("total"))
    return (
        tok.join(maybe_broadcast(vocab), "t")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            # Per-token -ln(p) is a deterministic scalar, but AVERAGING raw
            # doubles is partition-order dependent; quantize each term to
            # exact 1e-6-unit int64s so the sum is associative and both
            # engines emit bit-identical scores (<=5e-7/token quantization,
            # immaterial for a quality filter).
            F.round(
                F.sum(
                    F.round(-F.log(F.col("n") / F.col("total")) * 1000000).cast("long")
                ).cast("double")
                / 1000000
                / F.count(F.lit(1)),
                6,
            ).alias("avg_neg_logprob"),
        )
    )


@register(
    "sim_doc_cosine_sparse",
    oracle=f"""
    WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS term FROM documents),
    tf AS (
        SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM tok GROUP BY doc_id, term
    ),
    capped AS (
        SELECT doc_id, term, tf FROM tf
        QUALIFY COUNT(*) OVER (PARTITION BY term) <= 100
    ),
    nrm AS (
        SELECT doc_id, sqrt(CAST(SUM(tf * tf) AS DOUBLE)) AS nrm
        FROM capped GROUP BY doc_id
    ),
    pair AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(SUM(a.tf * b.tf) AS BIGINT) AS dot
        FROM capped a JOIN capped b
          ON a.term = b.term AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b, dot, round(cosine, 6) AS cosine, rnk
    FROM (
        SELECT p.doc_a, p.doc_b, p.dot,
               p.dot / (na.nrm * nb.nrm) AS cosine,
               row_number() OVER (
                   PARTITION BY p.doc_a
                   ORDER BY p.dot / (na.nrm * nb.nrm) DESC, p.doc_b
               ) AS rnk
        FROM pair p
        JOIN nrm na ON na.doc_id = p.doc_a
        JOIN nrm nb ON nb.doc_id = p.doc_b
    ) WHERE rnk <= 3
    """,
    doc="Sparse-vector document cosine similarity (top-3 neighbors per doc) "
        "via an INVERTED-INDEX join — the scale-path complement to the dense "
        "embedding similarity family: docs only pair up where they SHARE a "
        "term, so the candidate set is the posting-list self-join, not "
        "all-pairs. Terms appearing in >100 docs (stop terms) are dropped "
        "first — the same skew guard as LSH max_bucket / Jaccard max_df: one "
        "hot posting list would alone contribute O(df^2) pairs. Counts and "
        "dot products are exact int64 (order-independent); norms take one "
        "sqrt of an exact int at the end, so both engines emit bit-identical "
        "doubles and the rank order is deterministic (ties broken by doc_b). "
        "Scale: tf aggregation shuffles on (doc,term); the pair join "
        "shuffles on term with per-term fanout bounded by the df cap; the "
        "df-capped vocab is small and broadcast.",
)
def sim_doc_cosine_sparse(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    keep = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= 100)
        .select("term")
    )
    capped = tf.join(maybe_broadcast(keep), "term")
    nrm = capped.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("tf") * F.col("tf")).cast("double")).alias("nrm")
    )
    a = capped.select(
        F.col("doc_id").alias("doc_a"), "term", F.col("tf").alias("tf_a")
    )
    b = capped.select(
        F.col("doc_id").alias("doc_b"), "term", F.col("tf").alias("tf_b")
    )
    pair = (
        a.join(b, "term")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("tf_a") * F.col("tf_b")).alias("dot"))
    )
    na = nrm.select(F.col("doc_id").alias("doc_a"), F.col("nrm").alias("na"))
    nb = nrm.select(F.col("doc_id").alias("doc_b"), F.col("nrm").alias("nb"))
    cos = F.col("dot") / (F.col("na") * F.col("nb"))
    w = Window.partitionBy("doc_a").orderBy(cos.desc(), F.col("doc_b"))
    return (
        pair.join(na, "doc_a")
        .join(nb, "doc_b")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "doc_a", "doc_b", "dot",
            F.round(cos, 6).alias("cosine"),
            "rnk",
        )
    )


@register(
    "join_fuzzy_name_pairs",
    oracle="""
    WITH names AS (
        SELECT p_name, CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM part GROUP BY p_name
    )
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS edit_dist,
           a.n_rows AS n_rows_a, b.n_rows AS n_rows_b
    FROM names a JOIN names b
      ON split_part(a.p_name, ' ', 1) = split_part(b.p_name, ' ', 1)
     AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 3
    """,
    doc="Fuzzy entity-resolution join: near-duplicate name pairs within "
        "Levenshtein distance 3, blocked on the first token. The critical "
        "scale move is resolving the DISTINCT-value dictionary, not the "
        "rows: names collapse to |vocab| entries (with row counts carried "
        "for impact accounting) BEFORE the quadratic comparison, and the "
        "first-token block turns the all-pairs edit-distance scan into "
        "per-block candidate sets — the same blocking discipline as LSH "
        "banding. levenshtein() is a JVM codegen'd builtin in Spark and a "
        "native function in DuckDB with identical unit-cost edit-distance "
        "semantics.",
)
def join_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    names = p.groupBy("p_name").agg(F.count(F.lit(1)).alias("n_rows"))
    a = names.select(
        F.col("p_name").alias("name_a"),
        F.col("n_rows").alias("n_rows_a"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("blk_a"),
    )
    b = names.select(
        F.col("p_name").alias("name_b"),
        F.col("n_rows").alias("n_rows_b"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("blk_b"),
    )
    dist = F.levenshtein(F.col("name_a"), F.col("name_b"))
    return (
        a.join(b, (F.col("blk_a") == F.col("blk_b")) & (F.col("name_a") < F.col("name_b")))
        .filter(dist <= 3)
        .select(
            "name_a", "name_b",
            dist.cast("int").alias("edit_dist"),
            "n_rows_a", "n_rows_b",
        )
    )


#: GPT-2-style pre-tokenization regex, restricted to constructs with
#: identical semantics in Java regex (Spark) and RE2 (DuckDB): contraction
#: suffixes, space-prefixed letter runs, digit runs, punctuation runs, and
#: whitespace runs. No lookarounds (RE2 has none).
_BPE_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s']+|\s+"
#: the same pattern as a SQL string literal (embedded quotes doubled)
_BPE_RE_SQL = _BPE_RE.replace("'", "''")


@register(
    "text_bpe_regex_tokens",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(lower(text), '{_BPE_RE_SQL}')) AS BIGINT)
               AS n_bpe_tokens,
           CAST(len({_TOKS}) AS BIGINT) AS n_ws_tokens,
           round(CAST(len(regexp_extract_all(lower(text), '{_BPE_RE_SQL}')) AS DOUBLE)
                 / greatest(len({_TOKS}), 1), 6) AS bpe_per_word
    FROM documents
    """,
    doc="BPE-style token counting: a GPT-2-ish pre-tokenizer regex "
        "(contractions / letter runs / digit runs / punctuation runs / "
        "whitespace) counted per document next to the whitespace token "
        "count, plus the tokens-per-word expansion ratio — the standard "
        "cost model for context-window budgeting when the real tokenizer "
        "is too expensive to run corpus-wide. The pattern is restricted to "
        "the Java-regex/RE2 common subset so both engines tokenize "
        "byte-identically. Map-side only: regexp_extract_all + size, zero "
        "shuffles at any corpus size.",
)
def text_bpe_regex_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    bpe = F.size(F.regexp_extract_all(F.lower("text"), F.lit(_BPE_RE), F.lit(0)))
    ws = F.size(tokens(F.col("text")))
    return d.select(
        "doc_id",
        bpe.cast("long").alias("n_bpe_tokens"),
        ws.cast("long").alias("n_ws_tokens"),
        F.round(
            bpe.cast("double") / F.greatest(ws, F.lit(1)), 6
        ).alias("bpe_per_word"),
    )


@register(
    "text_readability",
    oracle=f"""
    SELECT doc_id,
           CAST(len({_TOKS}) AS BIGINT) AS n_words,
           CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT)
               AS n_sentences,
           CAST(greatest(len(regexp_extract_all(lower(text), '[aeiouy]+')), 1)
               AS BIGINT) AS n_syllables,
           round(206.835
                 - 1.015 * (len({_TOKS})
                            / CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
                                   AS DOUBLE))
                 - 84.6 * (greatest(len(regexp_extract_all(lower(text), '[aeiouy]+')), 1)
                           / CAST(greatest(len({_TOKS}), 1) AS DOUBLE)), 4)
               AS flesch_score
    FROM documents
    """,
    doc="Flesch reading-ease scoring per document — the readability axis "
        "of corpus quality filtering (too-hard and too-trivial documents "
        "both get down-weighted in curation mixes). Sentences are counted "
        "as terminal-punctuation runs and syllables approximated as vowel-"
        "group runs — the standard dictionary-free heuristic — with both "
        "counts floored at 1 so the formula is total on degenerate "
        "inputs. Pure per-row JVM regexp/arithmetic column work: no "
        "shuffle, no UDF, whole-stage-codegen end to end; the regex "
        "subset ([.!?]+ / [aeiouy]+ character-class runs) has identical "
        "semantics in Java regex and RE2. Reference parity: extension "
        "surface (SURVEY.md §2.B text analysis).",
)
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    n_words = F.size(tokens(F.col("text"))).cast("long")
    n_sent = F.greatest(
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[.!?]+"), F.lit(0))),
        F.lit(1),
    ).cast("long")
    n_syll = F.greatest(
        F.size(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"[aeiouy]+"), F.lit(0))
        ),
        F.lit(1),
    ).cast("long")
    flesch = F.round(
        F.lit(206.835)
        - F.lit(1.015) * (n_words / n_sent.cast("double"))
        - F.lit(84.6)
        * (n_syll / F.greatest(n_words, F.lit(1)).cast("double")),
        4,
    )
    return d.select(
        "doc_id",
        n_words.alias("n_words"),
        n_sent.alias("n_sentences"),
        n_syll.alias("n_syllables"),
        flesch.alias("flesch_score"),
    )


@register(
    "text_bigram_logprob",
    oracle=f"""
    WITH tk AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    pairs AS (
        SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
        FROM tk, UNNEST(generate_series(1, len(t) - 1)) AS u(i)
    ),
    big AS (SELECT w1, w2, COUNT(*) AS c12 FROM pairs GROUP BY w1, w2),
    uni AS (SELECT w1, SUM(c12) AS c1 FROM big GROUP BY w1),
    v AS (SELECT COUNT(DISTINCT w2) AS vocab FROM big)
    SELECT p.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           round(CAST(SUM(CAST(round(
                     -ln((c12 + 1.0) / (c1 + vocab)) * 1000000) AS BIGINT))
                 AS DOUBLE) / 1000000 / COUNT(*), 6) AS avg_neg_logprob
    FROM pairs p
    JOIN big USING (w1, w2) JOIN uni USING (w1) CROSS JOIN v
    GROUP BY p.doc_id
    """,
    doc="Bigram LM quality score with add-one smoothing (the next step up "
        "from text_unigram_logprob's CCNet-style filter): per-doc average "
        "negative log P(w2|w1) under corpus-wide bigram statistics. Bigram "
        "pairs are built ARRAY-LOCALLY inside each row (slice+transform — "
        "no positional self-join shuffle); the count tables are "
        "vocabulary-bounded and broadcast back onto the pair stream, so "
        "the only corpus-sized shuffles are the two count aggregations. "
        "Per-pair -ln(p) is quantized to exact 1e-6-unit int64s before "
        "summing (the established cross-engine determinism trick). At "
        "100 TB the LM tables are computed once per corpus snapshot and "
        "reused; scoring is a broadcast-join map pass. Reference parity: "
        "extension surface (SURVEY.md §2.B text analysis).",
)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r12 (guide §2.4/§5): the tokenize+bigram explode ran once per
    # consumer of the un-materialized pair stream — big(1), uni via
    # big(2), vocab via big(3), the attach join(4) — all at the one-split
    # scan's parallelism. Spread the scan, checkpoint the pair stream
    # once, and checkpoint the vocabulary^2-bounded bigram table so its
    # three rollup consumers read a leaf. Identical counts either way.
    d = load_table(spark, sf_dir, "documents")
    tk = spread_small_input(d, "doc_id").select(
        "doc_id", tokens(F.col("text")).alias("t")
    )
    pairs = (
        tk.select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(slice(t, 1, greatest(size(t) - 1, 0)), "
                    "(w, i) -> struct(w AS w1, element_at(t, i + 2) AS w2))"
                )
            ).alias("pr"),
        )
        .select("doc_id", F.col("pr.w1").alias("w1"), F.col("pr.w2").alias("w2"))
        .localCheckpoint(eager=True)
    )
    big = (
        pairs.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
        .localCheckpoint(eager=True)
    )
    uni = big.groupBy("w1").agg(F.sum("c12").alias("c1"))
    v = big.agg(F.countDistinct("w2").alias("vocab"))
    term = F.round(
        -F.log((F.col("c12") + F.lit(1.0)) / (F.col("c1") + F.col("vocab")))
        * 1000000
    ).cast("long")
    return (
        pairs.join(maybe_broadcast(big), ["w1", "w2"])
        .join(maybe_broadcast(uni), "w1")
        .crossJoin(F.broadcast(v))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(
                F.sum(term).cast("double") / 1000000 / F.count(F.lit(1)), 6
            ).alias("avg_neg_logprob"),
        )
    )


_RAKE_STOPS = "('a','the','of','and','in','to','is')"


@register(
    "text_keyword_rake",
    oracle=f"""
    WITH tk AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    tok AS (
        SELECT doc_id, i AS pos, t[i] AS w,
               t[i] IN {_RAKE_STOPS} AS is_stop
        FROM tk, UNNEST(generate_series(1, len(t))) AS u(i)
    ),
    ns AS (
        SELECT doc_id, pos, w,
               pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        FROM tok WHERE NOT is_stop
    ),
    pg AS (
        SELECT doc_id, grp,
               string_agg(w, ' ' ORDER BY pos) AS phrase,
               CAST(COUNT(*) AS BIGINT) AS plen
        FROM ns GROUP BY doc_id, grp
    ),
    phrases AS (
        SELECT n.doc_id, n.grp, n.w, g.plen, g.phrase
        FROM ns n JOIN pg g USING (doc_id, grp)
    ),
    wstat AS (
        SELECT w,
               CAST(COUNT(*) AS BIGINT) AS freq,
               CAST(SUM(plen) AS BIGINT) AS deg
        FROM phrases GROUP BY w
    ),
    scored AS (
        SELECT p.phrase,
               SUM(CAST(round(CAST(s.deg AS DOUBLE) / s.freq * 1000000)
                        AS BIGINT)) AS score_micro
        FROM phrases p JOIN wstat s USING (w)
        GROUP BY p.doc_id, p.grp, p.phrase
    )
    SELECT phrase,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           round(CAST(MAX(score_micro) AS DOUBLE) / 1000000, 6) AS rake_score
    FROM scored
    GROUP BY phrase
    QUALIFY row_number() OVER (ORDER BY MAX(score_micro) DESC, phrase) <= 25
    """,
    doc="RAKE keyword extraction (Rose et al. 2010): candidate phrases are "
        "maximal runs of non-stopword tokens (recovered RELATIONALLY with "
        "the gaps-and-islands difference trick — no per-row parser UDF); "
        "each word scores deg(w)/freq(w) over all phrase occurrences and a "
        "phrase scores the sum of its word scores; top-25 phrases by "
        "score. Word scores are quantized to exact 1e-6-unit int64s before "
        "the per-phrase sum so both engines rank identical integers (ties "
        "break on the phrase string). The word-stat table is "
        "vocabulary-bounded and broadcast; corpus-sized work is the "
        "tokenize pass plus one (doc, phrase-island) aggregation. At "
        "100 TB the top-25 collapses via partial TakeOrdered partials — "
        "no global sort of the phrase table. Reference parity: extension "
        "surface (SURVEY.md §2.B text analysis).",
)
def text_keyword_rake(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    stops = ["a", "the", "of", "and", "in", "to", "is"]
    tok = d.select(
        "doc_id",
        F.posexplode(tokens(F.col("text"))).alias("pos0", "w"),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "w")
    ns = tok.where(~F.col("w").isin(stops)).withColumn(
        "grp",
        F.col("pos")
        - F.row_number().over(Window.partitionBy("doc_id").orderBy("pos")),
    )
    island = Window.partitionBy("doc_id", "grp")
    pw = ns.select(
        "doc_id",
        "grp",
        "w",
        F.count(F.lit(1)).over(island).alias("plen"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("pos", "w")).over(island)
                ),
                lambda s: s.w,
            ),
            " ",
        ).alias("phrase"),
    )
    wstat = pw.groupBy("w").agg(
        F.count(F.lit(1)).alias("freq"),
        F.sum("plen").cast("long").alias("deg"),
    )
    score_term = F.round(
        F.col("deg").cast("double") / F.col("freq") * 1000000
    ).cast("long")
    scored = (
        pw.join(maybe_broadcast(wstat), "w")
        .groupBy("doc_id", "grp", "phrase")
        .agg(F.sum(score_term).alias("score_micro"))
    )
    # Top-25 via orderBy().limit(): TakeOrderedAndProject over the phrase
    # aggregate, not a single-partition row_number sort.
    ranked = (
        scored.groupBy("phrase")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.max("score_micro").alias("score_micro"),
        )
        .orderBy(F.col("score_micro").desc(), "phrase")
        .limit(25)
    )
    return ranked.select(
        "phrase",
        "n_occurrences",
        F.round(F.col("score_micro").cast("double") / 1000000, 6).alias(
            "rake_score"
        ),
    )


@register(
    "text_oov_rate",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, lang, unnest({_TOKS}) AS t FROM documents
    ),
    vocab AS (
        SELECT t FROM (
            SELECT t, COUNT(*) AS freq FROM tok GROUP BY t
            ORDER BY freq DESC, t LIMIT 10
        )
    ),
    flagged AS (
        SELECT k.doc_id, k.lang,
               CASE WHEN v.t IS NULL THEN 1 ELSE 0 END AS oov
        FROM tok k LEFT JOIN vocab v USING (t)
    )
    SELECT lang,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(oov) AS BIGINT) AS n_oov,
           CAST(CAST(SUM(oov) AS BIGINT) * 1000000
                // CAST(COUNT(*) AS BIGINT) AS BIGINT) AS oov_ppm
    FROM flagged GROUP BY lang
    """,
    doc="Out-of-vocabulary rate per language against the corpus's own "
        "top-10 token vocabulary (the synthetic corpus has ~31 distinct "
        "tokens, so top-10 leaves a real OOV tail; production sizes the "
        "cut to the tokenizer vocabulary) — the tokenizer-coverage / domain-"
        "shift signal a training pipeline checks before fixing a "
        "vocabulary (high OOV => the tokenizer will fragment this slice "
        "into rare pieces). The vocabulary is a TakeOrderedAndProject "
        "top-k of the token counts (freq-desc, token tie-break — "
        "deterministic, no global sort materialized) broadcast back "
        "over the token stream as a LEFT join null-flag; the rollup is "
        "one narrow lang-keyed aggregation with integral-ppm output. "
        "Corpus-sized work: the token explode feeds both the vocabulary "
        "count and the flag join — one scan each, both map-side "
        "combinable. Against a FIXED external vocabulary the top-k stage "
        "disappears and the join input is a constant table. Reference "
        "parity: extension surface (SURVEY.md §2.B text rows).",
)
def text_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", "lang", F.explode(tokens(F.col("text"))).alias("t")
    )
    vocab = (
        tok.groupBy("t")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), "t")
        .limit(10)
        .select("t", F.lit(1).alias("iv"))
    )
    flagged = tok.join(F.broadcast(vocab), "t", "left").select(
        "doc_id",
        "lang",
        F.when(F.col("iv").isNull(), 1).otherwise(0).alias("oov"),
    )
    return flagged.groupBy("lang").agg(
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum("oov").cast("long").alias("n_oov"),
        F.expr("(sum(oov) * 1000000) div count(1)")
        .cast("long")
        .alias("oov_ppm"),
    )


@register(
    "text_zipf_fit",
    oracle=f"""
    WITH tok AS (SELECT unnest({_TOKS}) AS t FROM documents),
    vocab AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS freq FROM tok GROUP BY t),
    ranked AS (
        SELECT freq,
               row_number() OVER (ORDER BY freq DESC, t) AS rnk
        FROM vocab
    ),
    pts AS (
        SELECT CAST(round(ln(rnk) * 1000000) AS BIGINT) AS lx,
               CAST(round(ln(freq) * 1000000) AS BIGINT) AS ly
        FROM ranked WHERE rnk <= 1000
    ),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(lx) AS DOUBLE) / 1000000 AS sx,
               CAST(SUM(ly) AS DOUBLE) / 1000000 AS sy,
               CAST(SUM(CAST(lx AS DECIMAL(38,0)) * CAST(lx AS DECIMAL(38,0)))
                    AS DOUBLE) / 1000000000000 AS sxx,
               CAST(SUM(CAST(lx AS DECIMAL(38,0)) * CAST(ly AS DECIMAL(38,0)))
                    AS DOUBLE) / 1000000000000 AS sxy,
               CAST(SUM(CAST(ly AS DECIMAL(38,0)) * CAST(ly AS DECIMAL(38,0)))
                    AS DOUBLE) / 1000000000000 AS syy
        FROM pts
    )
    SELECT n AS n_terms,
           round(-(n*sxy - sx*sy) / (n*sxx - sx*sx), 6) AS zipf_exponent,
           round((n*sxy - sx*sy) * (n*sxy - sx*sy)
                 / ((n*sxx - sx*sx) * (n*syy - sy*sy)), 6) AS r2
    FROM s
    """,
    doc="Zipf's-law fit of the corpus frequency distribution (the "
        "corpus-health diagnostic: natural text has exponent ~1, spammy or "
        "templated corpora deviate): OLS of ln(freq) on ln(rank) over the "
        "top-1000 vocabulary terms. Ranks are deterministic (freq desc, "
        "term tie-break); each ln() is quantized to exact 1e-6-unit int64 "
        "BEFORE the regression sums (ln is not IEEE-pinned across "
        "engines, +,-,*,/ on the quantized sums are), so both engines fit "
        "identical integers. Corpus-sized work is one token count; the "
        "fit runs on 1000 rows. Reference parity: extension surface "
        "(SURVEY.md §2.B text analysis).",
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(F.explode(tokens(F.col("text"))).alias("t"))
    vocab = tok.groupBy("t").agg(F.count(F.lit(1)).cast("long").alias("freq"))
    # Top-1000 via orderBy().limit() (TakeOrderedAndProject over the
    # vocabulary), then assign ranks with a window over the BOUNDED
    # 1000-row result — the log-log fit needs the rank value, but the
    # full-vocabulary single-partition sort the old global row_number did
    # is never built.
    top = vocab.orderBy(F.col("freq").desc(), "t").limit(1000)
    ranked = top.withColumn(
        "rnk", F.row_number().over(Window.orderBy(F.col("freq").desc(), "t"))
    )
    pts = ranked.select(
        F.round(F.log("rnk") * 1000000).cast("long").alias("lx"),
        F.round(F.log("freq") * 1000000).cast("long").alias("ly"),
    )
    lx38 = F.col("lx").cast("decimal(38,0)")
    ly38 = F.col("ly").cast("decimal(38,0)")
    s = pts.agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("lx").cast("double") / 1000000).alias("sx"),
        (F.sum("ly").cast("double") / 1000000).alias("sy"),
        (F.sum(lx38 * lx38).cast("double") / 1_000_000_000_000).alias("sxx"),
        (F.sum(lx38 * ly38).cast("double") / 1_000_000_000_000).alias("sxy"),
        (F.sum(ly38 * ly38).cast("double") / 1_000_000_000_000).alias("syy"),
    )
    n = F.col("n")
    cov = n * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = n * F.col("syy") - F.col("sy") * F.col("sy")
    return s.select(
        n.alias("n_terms"),
        F.round(-cov / vx, 6).alias("zipf_exponent"),
        F.round(cov * cov / (vx * vy), 6).alias("r2"),
    )


@register(
    "text_source_divergence",
    oracle=f"""
    WITH tok AS (
        SELECT source, unnest({_TOKS}) AS t FROM documents
    ),
    cs AS (SELECT source, t, CAST(COUNT(*) AS BIGINT) AS c
           FROM tok GROUP BY source, t),
    ns AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM cs GROUP BY source),
    cv AS (SELECT t, CAST(SUM(c) AS BIGINT) AS c FROM cs GROUP BY t),
    nc AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cs),
    grid AS (
        SELECT s.source, v.t, COALESCE(cs.c, 0) AS c_src,
               s.n AS n_src, v.c AS c_all, nc.n AS n_all
        FROM ns s CROSS JOIN cv v CROSS JOIN nc
        LEFT JOIN cs ON cs.source = s.source AND cs.t = v.t
    ),
    terms AS (
        SELECT source,
               CAST(round((
                   CASE WHEN c_src > 0
                        THEN 0.5 * (CAST(c_src AS DOUBLE) / n_src)
                             * ln((CAST(c_src AS DOUBLE) / n_src)
                                  / ((CAST(c_src AS DOUBLE) / n_src
                                      + CAST(c_all AS DOUBLE) / n_all) / 2))
                        ELSE 0 END
                   + 0.5 * (CAST(c_all AS DOUBLE) / n_all)
                     * ln((CAST(c_all AS DOUBLE) / n_all)
                          / ((CASE WHEN c_src > 0
                                   THEN CAST(c_src AS DOUBLE) / n_src
                                   ELSE 0 END
                              + CAST(c_all AS DOUBLE) / n_all) / 2))
               ) * 1000000000) AS BIGINT) AS term_nano
        FROM grid
    )
    SELECT source,
           round(CAST(SUM(term_nano) AS DOUBLE) / 1000000000, 6)
               AS js_divergence
    FROM terms GROUP BY source
    """,
    doc="Per-source Jensen-Shannon divergence from the corpus unigram "
        "distribution (the drift/distinctiveness score used to spot "
        "off-distribution sources before they skew training): "
        "JS(P_source || P_corpus) summed over the corpus vocabulary. The "
        "probability grid is (sources x vocab) — BOTH bounded, built from "
        "three broadcast-sized count tables; the only corpus-sized work "
        "is the one token-count pass. Per-term contributions are "
        "quantized to exact 1e-9-unit int64s before summation (ln is not "
        "IEEE-pinned; the divisions feeding it are identical doubles), so "
        "both engines sum identical integers. At 100 TB the vocab tables "
        "are snapshot artifacts reused across scoring runs. Reference "
        "parity: extension surface (SURVEY.md §2.B text analysis).",
)
def text_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("source", F.explode(tokens(F.col("text"))).alias("t"))
    # one corpus-sized count to the (source, term) grid; the three
    # marginals DERIVE from it instead of re-exploding the corpus each
    cs = tok.groupBy("source", "t").agg(F.count(F.lit(1)).alias("c_src"))
    ns = cs.groupBy("source").agg(F.sum("c_src").alias("n_src"))
    cv = cs.groupBy("t").agg(F.sum("c_src").alias("c_all"))
    nc = cs.agg(F.sum("c_src").alias("n_all"))
    grid = (
        ns.crossJoin(maybe_broadcast(cv))
        .crossJoin(F.broadcast(nc))
        .join(maybe_broadcast(cs), ["source", "t"], "left")
        .withColumn("c_src", F.coalesce(F.col("c_src"), F.lit(0)))
    )
    ps = F.col("c_src").cast("double") / F.col("n_src")
    pc = F.col("c_all").cast("double") / F.col("n_all")
    m = (F.when(F.col("c_src") > 0, ps).otherwise(F.lit(0.0)) + pc) / 2
    term = (
        F.when(F.col("c_src") > 0, F.lit(0.5) * ps * F.log(ps / m)).otherwise(
            F.lit(0.0)
        )
        + F.lit(0.5) * pc * F.log(pc / m)
    )
    terms = grid.select(
        "source",
        F.round(term * 1_000_000_000).cast("long").alias("term_nano"),
    )
    return terms.groupBy("source").agg(
        F.round(F.sum("term_nano").cast("double") / 1_000_000_000, 6).alias(
            "js_divergence"
        )
    )


@register(
    "text_vocab_growth_heaps",
    oracle=f"""
    WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS t FROM documents),
    first_doc AS (SELECT t, MIN(doc_id) AS fd FROM tok GROUP BY t),
    new_terms AS (
        SELECT fd AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_new
        FROM first_doc GROUP BY fd
    ),
    per_doc AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok
        FROM tok GROUP BY doc_id
    ),
    growth AS (
        SELECT p.doc_id,
               SUM(p.n_tok) OVER (ORDER BY p.doc_id) AS cum_tokens,
               SUM(COALESCE(n.n_new, 0)) OVER (ORDER BY p.doc_id)
                   AS cum_vocab
        FROM per_doc p LEFT JOIN new_terms n ON n.doc_id = p.doc_id
    ),
    pts AS (
        SELECT CAST(round(ln(cum_tokens) * 1000000) AS BIGINT) AS lx,
               CAST(round(ln(cum_vocab) * 1000000) AS BIGINT) AS ly
        FROM growth
    ),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(lx) AS DOUBLE) / 1000000 AS sx,
               CAST(SUM(ly) AS DOUBLE) / 1000000 AS sy,
               CAST(SUM(CAST(lx AS DECIMAL(38,0)) * CAST(lx AS DECIMAL(38,0)))
                    AS DOUBLE) / 1000000000000 AS sxx,
               CAST(SUM(CAST(lx AS DECIMAL(38,0)) * CAST(ly AS DECIMAL(38,0)))
                    AS DOUBLE) / 1000000000000 AS sxy
        FROM pts
    )
    SELECT n AS n_points,
           round((n*sxy - sx*sy) / (n*sxx - sx*sx), 6) AS heaps_beta,
           (SELECT CAST(MAX(cum_vocab) AS BIGINT) FROM growth)
               AS final_vocab,
           (SELECT CAST(MAX(cum_tokens) AS BIGINT) FROM growth)
               AS final_tokens
    FROM s
    """,
    doc="Heaps'-law vocabulary-growth fit (V ~ k*N^beta; beta far from "
        "~0.4-0.6 flags synthetic or repetitive corpora — the companion "
        "diagnostic to text_zipf_fit): cumulative vocabulary is computed "
        "WITHOUT a corpus-ordered scan by assigning each term to its "
        "FIRST document (one vocabulary-keyed MIN), rolling new-term "
        "counts up to the bounded per-doc grid, and running both "
        "cumulative sums over #docs rows. The log-log OLS uses the "
        "engine's quantized-ln + exact-sum recipe. Corpus-sized work: the "
        "token count and the first-doc MIN — both map-side combinable. "
        "Reference parity: extension surface (SURVEY.md §2.B text rows).",
)
def text_vocab_growth_heaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("t"))
    first_doc = tok.groupBy("t").agg(F.min("doc_id").alias("fd"))
    new_terms = first_doc.groupBy(F.col("fd").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("n_new")
    )
    per_doc = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_tok"))
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    growth = (
        per_doc.join(new_terms, "doc_id", "left")
        .select(
            "doc_id",
            F.sum("n_tok").over(w).alias("cum_tokens"),
            F.sum(F.coalesce(F.col("n_new"), F.lit(0))).over(w).alias(
                "cum_vocab"
            ),
        )
        .localCheckpoint(eager=True)
    )
    pts = growth.select(
        F.round(F.log("cum_tokens") * 1000000).cast("long").alias("lx"),
        F.round(F.log("cum_vocab") * 1000000).cast("long").alias("ly"),
    )
    lx38 = F.col("lx").cast("decimal(38,0)")
    ly38 = F.col("ly").cast("decimal(38,0)")
    s = pts.agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("lx").cast("double") / 1000000).alias("sx"),
        (F.sum("ly").cast("double") / 1000000).alias("sy"),
        (F.sum(lx38 * lx38).cast("double") / 1_000_000_000_000).alias("sxx"),
        (F.sum(lx38 * ly38).cast("double") / 1_000_000_000_000).alias("sxy"),
    )
    maxes = growth.agg(
        F.max("cum_vocab").cast("long").alias("final_vocab"),
        F.max("cum_tokens").cast("long").alias("final_tokens"),
    )
    n = F.col("n")
    cov = n * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    return s.crossJoin(F.broadcast(maxes)).select(
        n.alias("n_points"),
        F.round(cov / vx, 6).alias("heaps_beta"),
        "final_vocab",
        "final_tokens",
    )


@register(
    "text_char_trigram_profile",
    oracle="""
    WITH ch AS (
        SELECT lang,
               substring(lower(trim(text)), i, 3) AS tri
        FROM documents,
             UNNEST(generate_series(1, greatest(length(trim(text)) - 2, 0)))
                 AS u(i)
        WHERE text IS NOT NULL
    ),
    counts AS (
        SELECT lang, tri, CAST(COUNT(*) AS BIGINT) AS n
        FROM ch WHERE tri NOT LIKE '% %' GROUP BY lang, tri
    )
    SELECT lang, tri, n, rnk FROM (
        SELECT lang, tri, n,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY n DESC, tri) AS rnk
        FROM counts
    ) WHERE rnk <= 10
    """,
    doc="Character-trigram language signatures (the Cavnar-Trenkle n-gram "
        "profile behind real language-ID, vs text_langid's stopword "
        "shortcut): per language, the top-10 space-free character "
        "trigrams by frequency. Trigrams are generated ARRAY-LOCALLY per "
        "row (positional substring over an index spine — no "
        "self-join); the count table is alphabet^3-bounded per language, "
        "so the only corpus-sized work is the one generate+count pass "
        "and the per-lang rank runs on bounded rows. At 100 TB these "
        "profiles are the classifier model — built once per corpus "
        "snapshot, then applied map-side. Reference parity: extension "
        "surface (SURVEY.md §2.B text analysis).",
)
def text_char_trigram_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    tri = (
        d.select(
            "lang",
            F.explode(
                F.expr(
                    "transform(sequence(1, greatest(length(trim(text)) - 2, 0)), "
                    "i -> substring(lower(trim(text)), i, 3))"
                )
            ).alias("tri"),
        )
        # guard BOTH the space filter and the short-text edge: Spark's
        # sequence(1, 0) is DESCENDING [1, 0] (not empty like DuckDB's
        # generate_series), so texts under 3 chars would emit two bogus
        # sub-3-char "trigrams"; exact-length-3 keeps engines identical
        # on any input
        .where((F.length("tri") == 3) & ~F.col("tri").contains(" "))
    )
    counts = tri.groupBy("lang", "tri").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), "tri")
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 10)
        .select("lang", "tri", "n", "rnk")
    )


def _kgram_sql(k: int) -> str:
    """DuckDB fragment matching word_shingles(tokens(text), k)."""
    return (
        "list_distinct(list_transform(generate_series(0, greatest(len({t}) - "
        f"{k}, 0)), i -> array_to_string(list_slice({{t}}, i + 1, i + {k}), ' ')))"
    ).format(t=_TOKS)


@register(
    "text_duplicated_span_profile",
    oracle=f"""
    WITH grams AS (
        SELECT 4 AS l, doc_id, unnest({_kgram_sql(4)}) AS g FROM documents
        UNION ALL
        SELECT 8 AS l, doc_id, unnest({_kgram_sql(8)}) AS g FROM documents
        UNION ALL
        SELECT 16 AS l, doc_id, unnest({_kgram_sql(16)}) AS g FROM documents
    ),
    per_gram AS (
        SELECT l, g, COUNT(DISTINCT doc_id) AS n_docs FROM grams GROUP BY 1, 2
    )
    SELECT l AS span_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_spans,
           CAST(SUM(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_cross_doc_spans,
           round(SUM(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 6) AS cross_doc_rate,
           CAST(MAX(n_docs) AS BIGINT) AS max_span_df
    FROM per_gram GROUP BY 1
    """,
    doc="Cross-document duplicated-span profile at doubling span lengths "
        "(4/8/16 tokens) — the diagnostic behind exact-substring "
        "training-data dedup (Lee et al. 2022, 'Deduplicating Training "
        "Data Makes Language Models Better'): the rate at which spans "
        "of each scale recur across documents tells you whether "
        "boilerplate is phrase-level (high at 4, gone by 16) or "
        "wholesale template reuse (persists at 16), and max_span_df "
        "pinpoints the worst offender's spread. One exploded "
        "union-of-scales pass, grouped by (scale, span) — span strings "
        "are the group keys so the shuffle carries each distinct span "
        "once per doc; at 100 TB swap the span string for its sha2 to "
        "narrow the shuffle further (same plan shape, noted not done "
        "here to keep the oracle exact on the string domain).",
)
def text_duplicated_span_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    parts = []
    for k in (4, 8, 16):
        parts.append(
            d.select(
                F.lit(k).alias("l"),
                F.col("doc_id"),
                F.explode(word_shingles(tokens(F.col("text")), k)).alias("g"),
            )
        )
    grams = parts[0].unionAll(parts[1]).unionAll(parts[2])
    per_gram = grams.groupBy("l", "g").agg(
        F.count_distinct("doc_id").alias("n_docs")
    )
    return per_gram.groupBy(F.col("l").alias("span_tokens")).agg(
        F.count(F.lit(1)).cast("long").alias("n_distinct_spans"),
        F.sum((F.col("n_docs") >= 2).cast("long")).cast("long").alias(
            "n_cross_doc_spans"
        ),
        F.round(
            F.sum((F.col("n_docs") >= 2).cast("long"))
            / F.count(F.lit(1)),
            6,
        ).alias("cross_doc_rate"),
        F.max("n_docs").cast("long").alias("max_span_df"),
    )


@register(
    "text_bm25_topk",
    oracle=f"""
    WITH tf AS (
        SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM (SELECT doc_id, unnest({_TOKS}) AS term FROM documents)
        GROUP BY doc_id, term
    ),
    dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
    corp AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(dl) AS BIGINT) AS sdl FROM dl),
    q AS (SELECT unnest(['spark', 'join', 'scan']) AS term),
    df AS (SELECT tf.term, CAST(COUNT(*) AS BIGINT) AS df
           FROM tf JOIN q USING (term) GROUP BY 1),
    idf AS (
        SELECT term,
               CAST(round(ln(1 + (CAST(corp.n AS DOUBLE) - CAST(df AS DOUBLE)
                                  + 0.5) / (CAST(df AS DOUBLE) + 0.5))
                          * 1000000) AS BIGINT) AS idf_u
        FROM df CROSS JOIN corp
    ),
    scores AS (
        SELECT tf.doc_id,
               CAST(round(CAST(idf.idf_u AS DOUBLE)
                   * (CAST(tf.tf AS DOUBLE) * 2.2
                      / (CAST(tf.tf AS DOUBLE)
                         + 1.2 * (0.25 + 0.75 * CAST(dl.dl AS DOUBLE)
                                  * CAST(corp.n AS DOUBLE)
                                  / CAST(corp.sdl AS DOUBLE)))))
                   AS BIGINT) AS s_u
        FROM tf JOIN idf USING (term) JOIN dl USING (doc_id) CROSS JOIN corp
    )
    SELECT doc_id, round(CAST(SUM(s_u) AS DOUBLE) / 1000000, 6) AS bm25
    FROM scores GROUP BY doc_id ORDER BY bm25 DESC, doc_id LIMIT 10
    """,
    doc="BM25 ranked retrieval (Robertson-Sparck Jones, k1=1.2 b=0.75, "
        "the +1 idf variant that stays positive at df > N/2) for a fixed "
        "3-term query over the documents corpus — the lexical-retrieval "
        "baseline every RAG/hybrid-search stack needs next to the "
        "embedding top-k family. One explode+groupBy shuffle builds the "
        "(doc, term, tf) table; doc lengths derive from THAT table (no "
        "second corpus scan); df/idf live on the 3-row query-term frame "
        "and broadcast back. Each term's idf is ln-quantized to 1e-6 "
        "int64 before the pinned tf-saturation product, per-doc sums are "
        "exact integers, and top-10 is orderBy+limit = "
        "TakeOrderedAndProject. At 100 TB: linear in token volume, "
        "never materializes doc-x-vocab.",
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select("doc_id", F.explode(tokens("text")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        .localCheckpoint(eager=True)  # dl, df and scores all consume it
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
    corp = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("dl").cast("long").alias("sdl"),
    )
    qterms = ["spark", "join", "scan"]
    df = (
        tf.where(F.col("term").isin(qterms))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
    )
    idf = df.crossJoin(F.broadcast(corp)).select(
        "term",
        F.round(
            F.log(
                1
                + (F.col("n").cast("double") - F.col("df").cast("double") + 0.5)
                / (F.col("df").cast("double") + 0.5)
            )
            * 1000000
        )
        .cast("long")
        .alias("idf_u"),
    )
    s_u = F.round(
        F.col("idf_u").cast("double")
        * (
            F.col("tf").cast("double")
            * 2.2
            / (
                F.col("tf").cast("double")
                + 1.2
                * (
                    0.25
                    + 0.75
                    * F.col("dl").cast("double")
                    * F.col("n").cast("double")
                    / F.col("sdl").cast("double")
                )
            )
        )
    ).cast("long")
    return (
        tf.join(maybe_broadcast(idf), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(corp))
        .select("doc_id", s_u.alias("s_u"))
        .groupBy("doc_id")
        .agg(F.round(F.sum("s_u").cast("double") / 1000000, 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(10)
    )


@register(
    "text_pmi_collocations",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    uni AS (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS c
        FROM (SELECT unnest(t) AS term FROM toks) GROUP BY term
    ),
    nt AS (SELECT CAST(SUM(c) AS BIGINT) AS nt FROM uni),
    bg AS (
        SELECT split_part(bgs, ' ', 1) AS w1, split_part(bgs, ' ', 2) AS w2,
               CAST(COUNT(*) AS BIGINT) AS cab
        FROM (
            SELECT unnest(list_transform(generate_series(0, len(t) - 2),
                          i -> array_to_string(list_slice(t, i + 1, i + 2),
                                               ' '))) AS bgs
            FROM toks WHERE len(t) >= 2
        ) GROUP BY 1, 2
    ),
    nb AS (SELECT CAST(SUM(cab) AS BIGINT) AS nb FROM bg),
    scored AS (
        SELECT bg.w1, bg.w2, bg.cab,
               CAST(round(ln(CAST(bg.cab AS DOUBLE) * CAST(nt.nt AS DOUBLE)
                             * CAST(nt.nt AS DOUBLE)
                             / (CAST(nb.nb AS DOUBLE)
                                * CAST(u1.c AS DOUBLE)
                                * CAST(u2.c AS DOUBLE))) * 1000000)
                    AS BIGINT) AS pmi_u
        FROM bg
        JOIN uni u1 ON u1.term = bg.w1
        JOIN uni u2 ON u2.term = bg.w2
        CROSS JOIN nt CROSS JOIN nb
        WHERE bg.cab >= 25
    )
    SELECT w1, w2, cab, round(CAST(pmi_u AS DOUBLE) / 1000000, 6) AS pmi
    FROM scored ORDER BY pmi_u DESC, w1, w2 LIMIT 15
    """,
    doc="Pointwise-mutual-information collocation mining (Church & Hanks "
        "1990) — the phrase-discovery primitive behind tokenizer merge "
        "rules and multi-word-expression detection: PMI = "
        "ln(p(ab)/(p(a)p(b))) over adjacent token pairs, support-floored "
        "at 25 occurrences so rare-pair noise never surfaces. Two "
        "explode+groupBy passes (unigrams, positional bigrams) — the "
        "bigram key space is vocab^2-bounded, NOT corpus-sized — then "
        "broadcast unigram-count joins onto the bigram table; each "
        "ln() is quantized to 1e-6-unit int64 BEFORE ranking so both "
        "engines order identically, and top-15 is "
        "TakeOrderedAndProject. At 100 TB: linear token-volume scans, "
        "bounded everything after.",
)
def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        tokens("text").alias("t")
    )
    uni = (
        d.select(F.explode("t").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=True)  # joined twice + totalled
    )
    nt = uni.agg(F.sum("c").cast("long").alias("nt"))
    bg = (
        d.where(F.size("t") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(t) - 2),"
                    " i -> array_join(slice(t, i + 1, 2), ' '))"
                )
            ).alias("bgs")
        )
        .groupBy("bgs")
        .agg(F.count(F.lit(1)).cast("long").alias("cab"))
        .select(
            F.split_part(F.col("bgs"), F.lit(" "), F.lit(1)).alias("w1"),
            F.split_part(F.col("bgs"), F.lit(" "), F.lit(2)).alias("w2"),
            "cab",
        )
    )
    nb = bg.agg(F.sum("cab").cast("long").alias("nb"))
    u1 = uni.select(F.col("term").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("term").alias("w2"), F.col("c").alias("c2"))
    pmi_u = F.round(
        F.log(
            F.col("cab").cast("double")
            * F.col("nt").cast("double")
            * F.col("nt").cast("double")
            / (
                F.col("nb").cast("double")
                * F.col("c1").cast("double")
                * F.col("c2").cast("double")
            )
        )
        * 1000000
    ).cast("long")
    return (
        bg.where(F.col("cab") >= 25)
        .join(maybe_broadcast(u1), "w1")
        .join(maybe_broadcast(u2), "w2")
        .crossJoin(F.broadcast(nt))
        .crossJoin(F.broadcast(nb))
        .select("w1", "w2", "cab", pmi_u.alias("pmi_u"))
        .orderBy(F.col("pmi_u").desc(), "w1", "w2")
        .limit(15)
        .select(
            "w1",
            "w2",
            "cab",
            F.round(F.col("pmi_u").cast("double") / 1000000, 6).alias("pmi"),
        )
    )


@register(
    "text_burstiness_dispersion",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest({_TOKS}) AS t FROM documents
    ),
    per_doc AS (
        SELECT t, doc_id, CAST(COUNT(*) AS BIGINT) AS c
        FROM tok GROUP BY t, doc_id
    ),
    nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
    stats AS (
        SELECT t,
               CAST(COUNT(*) AS BIGINT) AS df,
               CAST(SUM(c) AS BIGINT) AS tf,
               CAST(SUM(CAST(c AS DECIMAL(38,0)) * CAST(c AS DECIMAL(38,0)))
                    AS DOUBLE) AS sc2
        FROM per_doc GROUP BY t
    )
    SELECT t AS term, df, tf,
           round((sc2 - CAST(tf AS DOUBLE) * tf / n_docs)
                 / CAST(tf AS DOUBLE), 6) AS vmr_dispersion,
           ((sc2 - CAST(tf AS DOUBLE) * tf / n_docs)
            / CAST(tf AS DOUBLE)) > 1.5 AS is_bursty
    FROM stats, nd
    """,
    doc="Per-term burstiness via the variance-to-mean (Fano) dispersion "
        "of per-document counts, zeros included (Church & Gale: content "
        "words are bursty — VMR >> 1 — while function words approach the "
        "Poisson VMR of 1): VMR = (sum c^2 - tf^2/N) / tf, computed from "
        "exact integer/DECIMAL sums with an IEEE-pinned finish, so the "
        "flag threshold compares identical doubles in both engines. The "
        "signal separates topical terms from glue vocabulary for "
        "keyword extraction and stopword induction without any lexicon. "
        "Scale: one (term, doc) count -> a vocab-bounded per-term "
        "rollup; the 1-row corpus count attaches via broadcast — cost "
        "is linear in token volume, output bounded by vocabulary. "
        "Reference parity: extension surface (SURVEY.md §2.B text "
        "rows).",
)
def text_burstiness_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("t"))
    per_doc = tok.groupBy("t", "doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    nd = d.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    cdec = F.col("c").cast("decimal(38,0)")
    stats = per_doc.groupBy("t").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum("c").cast("long").alias("tf"),
        F.sum(cdec * cdec).cast("double").alias("sc2"),
    )
    vmr = (
        F.col("sc2") - F.col("tf").cast("double") * F.col("tf") / F.col("n_docs")
    ) / F.col("tf").cast("double")
    return stats.crossJoin(F.broadcast(nd)).select(
        F.col("t").alias("term"),
        "df",
        "tf",
        F.round(vmr, 6).alias("vmr_dispersion"),
        (vmr > 1.5).alias("is_bursty"),
    )


_TRIGRAMS = (
    "list_distinct(list_transform(generate_series(0, greatest(len({t}) - 3, 0)), "
    "i -> array_to_string(list_slice({t}, i + 1, i + 3), ' ')))"
).format(t=_TOKS)


@register(
    "text_source_shingle_jaccard",
    oracle=f"""
    WITH tok AS (
        SELECT DISTINCT source, unnest({_TRIGRAMS}) AS s FROM documents
    ),
    sizes AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS v FROM tok GROUP BY source
    ),
    inter AS (
        SELECT a.source AS sa, b.source AS sb,
               CAST(COUNT(*) AS BIGINT) AS inter_cnt
        FROM tok a JOIN tok b ON a.s = b.s AND a.source < b.source
        GROUP BY a.source, b.source
    )
    SELECT i.sa AS source_a, i.sb AS source_b,
           x.v AS vocab_a, y.v AS vocab_b, i.inter_cnt,
           round(CAST(i.inter_cnt AS DOUBLE)
                 / (x.v + y.v - i.inter_cnt), 9) AS jaccard
    FROM inter i
    JOIN sizes x ON x.source = i.sa
    JOIN sizes y ON y.source = i.sb
    """,
    doc="Pairwise trigram-shingle vocabulary Jaccard between every pair of "
        "sources (|A intersect B| / |A union B| with the union size "
        "derived from exact integer counts, never materialized): the "
        "corpus-level source-similarity matrix that drives mixture "
        "dedup decisions — which crawls are near-copies of each other — "
        "one level above document-pair dedup. Trigram shingles, not "
        "unigrams: this corpus has only ~31 distinct tokens (probed "
        "before committing — unigram Jaccard is ~1.0 for every pair, "
        "vacuous), while trigram Jaccard spreads 0.01-0.08. Plan: one "
        "distinct (source, shingle) incidence collapse, then a "
        "shingle-keyed equi-join whose per-key fanout is bounded by the "
        "source domain — pair space is quadratic in |sources|, linear "
        "in shingle volume; at corpus-scale source counts (thousands of "
        "crawls) swap the exact pair join for the MinHash-LSH tier "
        "(operators/dedup.py) — same contract, banded candidates. "
        "Size-conditional broadcast on the per-source size table. "
        "Reference parity: extension surface (SURVEY.md §2.B text "
        "rows).",
)
def text_source_shingle_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tok = (
        d.select(
            "source",
            F.explode(word_shingles(tokens(F.col("text")), 3)).alias("s"),
        )
        .distinct()
        .localCheckpoint(eager=True)  # consumed by sizes and the pair join
    )
    sizes = tok.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("v"))
    a = tok.select(F.col("source").alias("sa"), "s")
    b = tok.select(F.col("source").alias("sb"), "s")
    inter = (
        a.join(b, "s")
        .where(F.col("sa") < F.col("sb"))
        .groupBy("sa", "sb")
        .agg(F.count(F.lit(1)).cast("long").alias("inter_cnt"))
    )
    return (
        inter.join(
            maybe_broadcast(sizes.select(F.col("source").alias("sa"),
                                         F.col("v").alias("vocab_a"))), "sa")
        .join(
            maybe_broadcast(sizes.select(F.col("source").alias("sb"),
                                         F.col("v").alias("vocab_b"))), "sb")
        .select(
            F.col("sa").alias("source_a"),
            F.col("sb").alias("source_b"),
            "vocab_a",
            "vocab_b",
            "inter_cnt",
            F.round(
                F.col("inter_cnt").cast("double")
                / (F.col("vocab_a") + F.col("vocab_b") - F.col("inter_cnt")),
                9,
            ).alias("jaccard"),
        )
    )


_TRIGRAMS_ALL = (
    "list_transform(generate_series(0, greatest(len({t}) - 3, 0)), "
    "i -> array_to_string(list_slice({t}, i + 1, i + 3), ' '))"
).format(t=_TOKS)


@register(
    "text_shingle_concentration",
    oracle=f"""
    WITH tok AS (
        SELECT source, unnest({_TRIGRAMS_ALL}) AS s FROM documents
    ),
    c AS (
        SELECT source, s, CAST(COUNT(*) AS BIGINT) AS c
        FROM tok GROUP BY source, s
    ),
    per_src AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS vocab,
               CAST(SUM(c) AS BIGINT) AS n_shingles,
               CAST(count_if(c = 1) AS BIGINT) AS hapax
        FROM c GROUP BY source
    ),
    ranked AS (
        SELECT source, c,
               row_number() OVER (
                   PARTITION BY source ORDER BY c DESC, s) AS rk
        FROM c
    ),
    top10 AS (
        SELECT source, CAST(SUM(c) AS BIGINT) AS top10_mass
        FROM ranked WHERE rk <= 10 GROUP BY source
    ),
    ent AS (
        SELECT c.source,
               CAST(SUM(CAST(round(c.c * ln(CAST(p.n_shingles AS DOUBLE)
                                            / c.c) * 1000000) AS BIGINT))
                    AS BIGINT) AS ent_micro
        FROM c JOIN per_src p ON p.source = c.source
        GROUP BY c.source
    )
    SELECT p.source, p.n_shingles, p.vocab,
           round(CAST(p.hapax AS DOUBLE) / p.vocab, 6) AS hapax_share,
           round(CAST(t.top10_mass AS DOUBLE) / p.n_shingles, 6)
               AS top10_mass_share,
           round(CAST(e.ent_micro AS DOUBLE) / p.n_shingles / 1000000, 6)
               AS entropy_nats
    FROM per_src p
    JOIN top10 t ON t.source = p.source
    JOIN ent e ON e.source = p.source
    """,
    doc="Per-source trigram-shingle frequency concentration: vocabulary "
        "size, hapax share (fraction of shingles seen once — the "
        "novelty ceiling for dedup), top-10 shingle mass (boilerplate "
        "signature), and Shannon entropy in nats (1e-6-quantized ln "
        "terms) — the per-crawl repetitiveness profile that flags "
        "template-heavy sources before they skew mixture weights "
        "(trigrams, not unigrams: this corpus's ~31-token unigram "
        "vocabulary has zero hapaxes, probed). Plan: one (source, "
        "shingle) count collapse; the top-10 rank window partitions by "
        "source over the count AGGREGATE (per-partition size bounded "
        "by the source's vocabulary, never the corpus); everything "
        "else is per-source bounded algebra. Reference parity: "
        "extension surface (SURVEY.md §2.B text rows).",
)
def text_shingle_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # ALL shingle occurrences (not distinct) — concentration needs counts
    toks = tokens(F.col("text"))
    shingles = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - 3, F.lit(0))),
        lambda i: F.array_join(F.slice(toks, i + 1, 3), " "),
    )
    tok = d.select("source", F.explode(shingles).alias("s"))
    c = tok.groupBy("source", "s").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    ).localCheckpoint(eager=True)  # consumed by per_src, ranked, ent
    per_src = c.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("vocab"),
        F.sum("c").cast("long").alias("n_shingles"),
        F.count_if(F.col("c") == 1).cast("long").alias("hapax"),
    )
    wr = Window.partitionBy("source").orderBy(F.col("c").desc(), "s")
    top10 = (
        c.withColumn("rk", F.row_number().over(wr))
        .where(F.col("rk") <= 10)
        .groupBy("source")
        .agg(F.sum("c").cast("long").alias("top10_mass"))
    )
    ent = (
        c.join(
            maybe_broadcast(per_src.select("source", "n_shingles")), "source"
        )
        .groupBy("source")
        .agg(
            F.sum(
                F.round(
                    F.col("c")
                    * F.log(F.col("n_shingles").cast("double") / F.col("c"))
                    * F.lit(1_000_000)
                ).cast("long")
            )
            .cast("long")
            .alias("ent_micro")
        )
    )
    return (
        per_src.join(top10, "source")
        .join(ent, "source")
        .select(
            "source",
            "n_shingles",
            "vocab",
            F.round(F.col("hapax").cast("double") / F.col("vocab"), 6)
            .alias("hapax_share"),
            F.round(
                F.col("top10_mass").cast("double") / F.col("n_shingles"), 6
            ).alias("top10_mass_share"),
            F.round(
                F.col("ent_micro").cast("double") / F.col("n_shingles")
                / F.lit(1_000_000),
                6,
            ).alias("entropy_nats"),
        )
    )


#: non-distinct per-doc word bigrams (every occurrence counts — hapax
#: analysis needs raw frequencies, unlike the _BIGRAMS dedup'd variant).
#: Docs with < 2 tokens emit NO bigrams (ADVICE r7: the old greatest(..., 0)
#: clamp let a 1-token doc contribute its lone token and an empty doc the
#: empty string, inflating vocab/hapax counts with degenerate entries).
_BIGRAMS_ALL = (
    "CASE WHEN len({t}) >= 2 THEN "
    "list_transform(generate_series(0, len({t}) - 2), "
    "i -> array_to_string(list_slice({t}, i + 1, i + 2), ' ')) "
    "ELSE CAST([] AS VARCHAR[]) END"
).format(t=_TOKS)


@register(
    "text_hapax_ratio_by_source",
    oracle=f"""
    WITH occ AS (
        SELECT source, unnest({_BIGRAMS_ALL}) AS bg FROM documents
    ),
    cnt AS (
        SELECT source, bg, CAST(COUNT(*) AS BIGINT) AS c
        FROM occ GROUP BY source, bg
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS vocab_bigrams,
           CAST(COUNT(*) FILTER (WHERE c = 1) AS BIGINT) AS hapax_bigrams,
           CAST(SUM(c) AS BIGINT) AS n_bigram_occurrences,
           round(CAST(COUNT(*) FILTER (WHERE c = 1) AS DOUBLE) / COUNT(*), 6)
               AS hapax_ratio
    FROM cnt GROUP BY source
    """,
    doc="Hapax-legomenon share per source: the fraction of each source's "
        "word-bigram vocabulary that occurs exactly once — the classic "
        "lexical-novelty signal (high hapax ratio = fresh productive "
        "text worth keeping; low = templated/boilerplate-heavy source "
        "worth down-weighting or dedup-auditing), the per-source "
        "companion to the global Zipf/Heaps fits. Bigrams are counted "
        "NON-distinct (raw occurrences — hapax needs true frequencies), "
        "generated by the same JVM expression shape as the corpus's "
        "other shingle ops. Plan: one explode scan -> (source, bigram) "
        "count -> bounded per-source rollup; both divisions are "
        "exact-long/exact-long. At corpus scale the only wide shuffle is "
        "the (source, bigram) count, the same key cardinality every "
        "df-style text op here already shuffles on. Reference parity: "
        "extension surface (SURVEY.md §2.B text rows).",
)
def text_hapax_ratio_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wal_consumer_spark.functions.text import let

    d = load_table(spark, sf_dir, "documents")
    # let-bind the token array: every lambda reference below becomes a
    # variable lookup instead of re-running the tokenizer per bigram
    # position (the word_shingles lesson — 3.5 s -> ~1 s at sf0.1)
    # Docs with < 2 tokens emit no bigrams — mirrors the oracle's
    # len(t) >= 2 guard (ADVICE r7: degenerate 1-token/empty entries).
    bigrams_all = let(
        tokens(F.col("text")),
        lambda t: F.when(
            F.size(t) >= 2,
            F.transform(
                F.sequence(F.lit(0), F.size(t) - 2),
                lambda i: F.array_join(F.slice(t, i + 1, 2), " "),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )
    occ = d.select("source", F.explode(bigrams_all).alias("bg"))
    cnt = occ.groupBy("source", "bg").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    return cnt.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("vocab_bigrams"),
        F.count_if(F.col("c") == 1).cast("long").alias("hapax_bigrams"),
        F.sum("c").cast("long").alias("n_bigram_occurrences"),
        F.round(
            F.count_if(F.col("c") == 1).cast("double") / F.count(F.lit(1)), 6
        ).alias("hapax_ratio"),
    )


@register(
    "text_vocab_topk_coverage",
    oracle=f"""
    WITH occ AS (
        SELECT unnest({_TOKS}) AS tok FROM documents
    ),
    cnt AS (
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM occ GROUP BY tok
    ),
    total AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cnt),
    top AS (
        SELECT tok, c,
               row_number() OVER (ORDER BY c DESC, tok) AS rk
        FROM cnt ORDER BY c DESC, tok LIMIT 16
    ),
    cum AS (
        SELECT rk, tok, c,
               SUM(c) OVER (ORDER BY rk
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS mass
        FROM top
    )
    SELECT CAST(k.k AS BIGINT) AS k,
           cum.tok AS boundary_token,
           CAST(cum.mass AS BIGINT) AS topk_occurrences,
           t.n AS total_occurrences,
           CAST(cum.mass AS DOUBLE) / t.n AS coverage_share
    FROM (SELECT unnest([1, 2, 4, 8, 16]) AS k) k
    JOIN cum ON cum.rk = k.k
    CROSS JOIN total t
    """,
    doc="Vocabulary coverage curve: the share of all token occurrences "
        "captured by the top-k most frequent tokens, for k in "
        "{1,2,4,8,16} — the token-budget planning readout behind "
        "vocabulary-size decisions (how big must the vocab be before "
        "OOV mass is negligible?), complementing text_zipf_fit (slope) "
        "and text_vocab_growth_heaps (growth). The top-k pick is "
        "orderBy().limit(16) — TakeOrderedAndProject, never a global "
        "window over the corpus-growing token table; the cumulative sum "
        "runs on the bounded 16-row frame. Ties at the rank boundary "
        "break deterministically on the token string. One explode scan, "
        "one token-keyed count (the same key cardinality every text op "
        "shuffles on), then bounded work. Reference parity: extension "
        "surface (SURVEY.md §2.B text rows).",
)
def text_vocab_topk_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    cnt = (
        d.select(F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    total = cnt.agg(F.sum("c").cast("long").alias("n"))
    top = cnt.orderBy(F.col("c").desc(), "tok").limit(16)
    w = Window.orderBy("rk").rowsBetween(Window.unboundedPreceding, 0)
    cum = top.select(
        F.row_number()
        .over(Window.orderBy(F.col("c").desc(), "tok"))
        .alias("rk"),
        "tok",
        "c",
    ).withColumn("mass", F.sum("c").over(w))
    ks = (
        spark.range(1)
        .select(
            F.explode(
                F.array(*[F.lit(k) for k in (1, 2, 4, 8, 16)])
            ).alias("k0")
        )
        .select(F.col("k0").cast("long").alias("k"))
    )
    return (
        ks.join(cum, ks.k == cum.rk)
        .crossJoin(F.broadcast(total))
        .select(
            "k",
            F.col("tok").alias("boundary_token"),
            F.col("mass").cast("long").alias("topk_occurrences"),
            F.col("n").alias("total_occurrences"),
            (F.col("mass").cast("double") / F.col("n")).alias(
                "coverage_share"
            ),
        )
    )


@register(
    "pipeline_tokenizer_fertility_by_lang",
    oracle=f"""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len({_TOKS})) AS BIGINT) AS ws_tokens,
           CAST(SUM(len(regexp_extract_all(lower(text), '{_BPE_RE_SQL}')))
                AS BIGINT) AS bpe_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(CAST(SUM(len(regexp_extract_all(lower(text),
                                                '{_BPE_RE_SQL}')))
                     AS HUGEINT) * 1000000
                // SUM(len({_TOKS})) AS BIGINT) AS fertility_ppm,
           CAST(CAST(SUM(n_chars) AS HUGEINT) * 1000000
                // SUM(len(regexp_extract_all(lower(text), '{_BPE_RE_SQL}')))
                AS BIGINT) AS chars_per_bpe_ppm
    FROM documents GROUP BY lang
    """,
    doc="Tokenizer fertility by language: BPE-style tokens per whitespace "
        "word and characters per BPE token, aggregated per lang — THE "
        "multilingual token-budget planning table (fertility differences "
        "are why the same char budget buys different context in en vs zh, "
        "and why mixture weights set in documents misprice languages in "
        "tokens; Scao et al.'s BLOOM report popularized the metric). "
        "Reuses text_bpe_regex_tokens' engine-identical Java/RE2-subset "
        "pre-tokenizer; counting is map-side, the only shuffle is the "
        "|langs|-row rollup, and both ratios are ppm floor divisions of "
        "exact integer sums (HUGEINT/DECIMAL — no doubles anywhere). "
        "Reference parity: extension surface (SURVEY.md §2.C curation "
        "rows).",
)
def pipeline_tokenizer_fertility_by_lang(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    bpe = F.size(
        F.regexp_extract_all(F.lower("text"), F.lit(_BPE_RE), F.lit(0))
    ).cast("long")
    ws = F.size(tokens(F.col("text"))).cast("long")
    return (
        d.select("lang", bpe.alias("bpe"), ws.alias("ws"), "n_chars")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("ws").cast("long").alias("ws_tokens"),
            F.sum("bpe").cast("long").alias("bpe_tokens"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.expr(
                "CAST(CAST(SUM(bpe) AS DECIMAL(38,0)) * 1000000 "
                "DIV SUM(ws) AS BIGINT)"
            ).alias("fertility_ppm"),
            F.expr(
                "CAST(CAST(SUM(n_chars) AS DECIMAL(38,0)) * 1000000 "
                "DIV SUM(bpe) AS BIGINT)"
            ).alias("chars_per_bpe_ppm"),
        )
    )


#: DuckDB fragment matching word_shingles(k=3) (distinct per-doc trigram
#: shingles) — same text normalization as _TOKS
_TRIGRAM_SHINGLES = (
    "list_distinct(list_transform(generate_series(0, greatest(len({t}) - 3, 0)), "
    "i -> array_to_string(list_slice({t}, i + 1, i + 3), ' ')))"
).format(t=_TOKS)


@register(
    "text_edit_distance_near_pairs",
    oracle=f"""
    WITH sh AS (
        SELECT doc_id, unnest({_TRIGRAM_SHINGLES}) AS shingle FROM documents
    ),
    shc AS (
        SELECT doc_id, shingle FROM (
            SELECT doc_id, shingle,
                   COUNT(*) OVER (PARTITION BY shingle) AS df
            FROM sh
        ) t WHERE df <= 1000
    ),
    inter AS (
        SELECT a.doc_id AS doc1, b.doc_id AS doc2, COUNT(*) AS n_common
        FROM shc a JOIN shc b USING (shingle)
        WHERE a.doc_id < b.doc_id GROUP BY 1, 2
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
    cand AS (
        SELECT doc1, doc2 FROM inter
        JOIN sizes s1 ON s1.doc_id = doc1
        JOIN sizes s2 ON s2.doc_id = doc2
        WHERE n_common * 25 >= s1.n + s2.n - n_common
    ),
    ed AS (
        SELECT c.doc1, c.doc2,
               levenshtein(d1.text, d2.text) AS dist,
               greatest(length(d1.text), length(d2.text)) AS mx
        FROM cand c
        JOIN documents d1 ON d1.doc_id = c.doc1
        JOIN documents d2 ON d2.doc_id = c.doc2
    ),
    nd AS (
        SELECT dist,
               CAST(CAST(dist AS HUGEINT) * 1000000 // mx AS BIGINT)
                   AS nd_ppm
        FROM ed WHERE mx > 0
    )
    SELECT CAST(nd_ppm // 100000 AS BIGINT) AS nd_decile,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(MIN(dist) AS BIGINT) AS min_edit,
           CAST(MAX(dist) AS BIGINT) AS max_edit,
           CAST(MIN(nd_ppm) AS BIGINT) AS min_nd_ppm,
           CAST(MAX(nd_ppm) AS BIGINT) AS max_nd_ppm
    FROM nd GROUP BY 1
    """,
    doc="Character-level edit distance over shingle-candidate near-dup "
        "pairs: exact Levenshtein (Spark's JVM levenshtein — never a "
        "Python loop) on pairs pre-filtered by 3-shingle Jaccard >= 0.04 "
        "(the df-capped candidate join — O(len^2) DP only ever runs on "
        "the bounded candidate set, the standard two-tier fuzzy-dup "
        "design), histogrammed by normalized-distance decile "
        "(dist/max_len in ppm) — the surface-edit complement to "
        "set-based Jaccard: catches small in-place edits (typo farms, "
        "template fills) that shingle overlap scores identically. "
        "Oracle equivalence note: DuckDB levenshtein counts BYTES, "
        "Spark counts CHARS — identical on this ASCII corpus (asserted "
        "in tests/test_round9_ops.py); on non-ASCII corpora the Spark "
        "side is the semantically correct one. Reference parity: "
        "extension surface (SURVEY.md §2.C text rows).",
)
def text_edit_distance_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wal_consumer_spark.operators.dedup import shingle_pairs_jaccard

    docs = load_table(spark, sf_dir, "documents")
    cand = (
        shingle_pairs_jaccard(docs, "doc_id", "text")
        .filter(
            F.col("n_common") * 25 >= F.col("n1") + F.col("n2") - F.col("n_common")
        )
        .select("doc1", "doc2")
    )
    txt = docs.select("doc_id", "text")
    ed = (
        cand.join(
            txt.withColumnsRenamed({"doc_id": "doc1", "text": "t1"}), "doc1"
        )
        .join(txt.withColumnsRenamed({"doc_id": "doc2", "text": "t2"}), "doc2")
        .select(
            F.levenshtein("t1", "t2").cast("long").alias("dist"),
            F.greatest(F.length("t1"), F.length("t2"))
            .cast("long")
            .alias("mx"),
        )
    )
    nd = ed.where(F.col("mx") > 0).select(
        "dist",
        F.expr(
            "CAST(CAST(dist AS DECIMAL(38,0)) * 1000000 DIV mx AS BIGINT)"
        ).alias("nd_ppm"),
    )
    return nd.groupBy(
        F.expr("CAST(nd_ppm DIV 100000 AS BIGINT)").alias("nd_decile")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.min("dist").cast("long").alias("min_edit"),
        F.max("dist").cast("long").alias("max_edit"),
        F.min("nd_ppm").cast("long").alias("min_nd_ppm"),
        F.max("nd_ppm").cast("long").alias("max_nd_ppm"),
    )


@register(
    "text_kneser_ney_bigram",
    oracle=f"""
    WITH tk AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    pairs AS (
        SELECT t[i] AS w1, t[i + 1] AS w2
        FROM tk, UNNEST(generate_series(1, len(t) - 1)) AS u(i)
    ),
    big AS (
        SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
        FROM pairs GROUP BY w1, w2
    ),
    uni AS (
        SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1,
               CAST(COUNT(*) AS BIGINT) AS n1plus_left
        FROM big GROUP BY w1
    ),
    cont AS (
        SELECT w2, CAST(COUNT(*) AS BIGINT) AS n_cont_right
        FROM big GROUP BY w2
    ),
    nall AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_types FROM big)
    SELECT b.w1, b.w2, b.c12, u.c1, u.n1plus_left, c.n_cont_right,
           n.n_types,
           CAST((CAST(greatest(4 * b.c12 - 3, 0) AS HUGEINT) * n.n_types
                 + 3 * CAST(u.n1plus_left AS HUGEINT) * c.n_cont_right)
                * 1000000
                // (4 * CAST(u.c1 AS HUGEINT) * n.n_types) AS BIGINT)
               AS pkn_ppm,
           CAST(CAST(3 * u.n1plus_left AS HUGEINT) * 1000000
                // (4 * u.c1) AS BIGINT) AS lambda_ppm
    FROM big b JOIN uni u USING (w1) JOIN cont c USING (w2)
    CROSS JOIN nall n
    ORDER BY b.c12 DESC, b.w1, b.w2
    LIMIT 20
    """,
    doc="Interpolated Kneser-Ney smoothed bigram probabilities for the "
        "top-20 bigrams — THE standard n-gram LM smoothing (the quality "
        "bar above text_bigram_logprob's add-one): P_KN(w2|w1) = "
        "max(c12-d,0)/c1 + d*N1+(w1.)/c1 * N1+(.w2)/N1+(..), with the "
        "canonical discount d=3/4 chosen so EVERYTHING stays exact-"
        "rational — pkn_ppm = [max(4*c12-3,0)*Ntypes + 3*N1left*Ncont] "
        "* 1e6 // (4*c1*Ntypes) is one integer floor division (no "
        "float smoothing drift between engines); lambda_ppm is the "
        "backoff mass. Continuation counts (distinct left contexts) are "
        "the KN novelty vs raw frequency. Scale: bigram pairs build "
        "array-locally per row; ONE corpus-sized groupBy(w1,w2) — uni/"
        "cont/Ntypes all derive from the vocabulary^2-bounded `big` "
        "table; top-20 is TakeOrderedAndProject. Reference parity: "
        "extension surface (SURVEY.md §2.B text analysis).",
)
def text_kneser_ney_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tk = d.select("doc_id", tokens(F.col("text")).alias("t"))
    pairs = tk.select(
        F.explode(
            F.expr(
                "transform(slice(t, 1, greatest(size(t) - 1, 0)), "
                "(w, i) -> struct(w AS w1, element_at(t, i + 2) AS w2))"
            )
        ).alias("pr")
    ).select(F.col("pr.w1").alias("w1"), F.col("pr.w2").alias("w2"))
    big = pairs.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("c12")
    )
    # uni / cont / n_types all derive from the bounded bigram-type table
    uni = big.groupBy("w1").agg(
        F.sum("c12").cast("long").alias("c1"),
        F.count(F.lit(1)).cast("long").alias("n1plus_left"),
    )
    cont = big.groupBy("w2").agg(
        F.count(F.lit(1)).cast("long").alias("n_cont_right")
    )
    nall = big.agg(F.count(F.lit(1)).cast("long").alias("n_types"))
    return (
        big.join(maybe_broadcast(uni), "w1")
        .join(maybe_broadcast(cont), "w2")
        .crossJoin(F.broadcast(nall))
        .select(
            "w1",
            "w2",
            "c12",
            "c1",
            "n1plus_left",
            "n_cont_right",
            "n_types",
            F.expr(
                "CAST((CAST(greatest(4 * c12 - 3, 0) AS DECIMAL(38,0)) "
                "* n_types + 3 * CAST(n1plus_left AS DECIMAL(38,0)) "
                "* n_cont_right) * 1000000 "
                "DIV (4 * CAST(c1 AS DECIMAL(38,0)) * n_types) AS BIGINT)"
            ).alias("pkn_ppm"),
            F.expr(
                "CAST(CAST(3 * n1plus_left AS DECIMAL(38,0)) * 1000000 "
                "DIV (4 * c1) AS BIGINT)"
            ).alias("lambda_ppm"),
        )
        .orderBy(F.col("c12").desc(), "w1", "w2")
        .limit(20)
    )


@register(
    "text_burrows_delta_sources",
    oracle=f"""
    WITH tok AS (
        SELECT source, unnest({_TOKS}) AS w FROM documents
    ),
    cnt AS (
        SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
        FROM tok GROUP BY source, w
    ),
    topw AS (
        SELECT w FROM (
            SELECT w, SUM(c) AS tot,
                   row_number() OVER (ORDER BY SUM(c) DESC, w) AS rn
            FROM cnt GROUP BY w
        ) WHERE rn <= 20
    ),
    srctot AS (
        SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM cnt GROUP BY source
    ),
    grid AS (
        SELECT s.source, t.w,
               CAST(COALESCE(c.c, 0) * 1000000 // s.n AS BIGINT) AS ppm
        FROM srctot s CROSS JOIN topw t
        LEFT JOIN cnt c ON c.source = s.source AND c.w = t.w
    ),
    wstat AS (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS ns,
               CAST(SUM(ppm) AS BIGINT) AS sx,
               CAST(SUM(ppm * ppm) AS BIGINT) AS sxx
        FROM grid GROUP BY w
    ),
    z AS (
        SELECT g.source, g.w,
               (g.ppm - CAST(s.sx AS DOUBLE) / s.ns)
               / sqrt((s.sxx - CAST(s.sx AS DOUBLE) * s.sx / s.ns) / s.ns)
                   AS z
        FROM grid g JOIN wstat s ON s.w = g.w
        WHERE s.sxx * s.ns > s.sx * s.sx
    ),
    pairs AS (
        SELECT a.source AS source_a, b.source AS source_b,
               CAST(COUNT(*) AS BIGINT) AS n_words,
               CAST(SUM(CAST(round(abs(a.z - b.z) * 1000000) AS BIGINT))
                    AS BIGINT) AS delta_sum_micro
        FROM z a JOIN z b ON b.w = a.w AND a.source < b.source
        GROUP BY a.source, b.source
    )
    SELECT source_a, source_b, n_words, delta_sum_micro,
           CAST(CAST(delta_sum_micro AS HUGEINT) // n_words AS BIGINT)
               AS delta_avg_micro
    FROM pairs
    """,
    doc="Burrows' Delta stylometric distance between every pair of "
        "sources: per-source rates (exact integer ppm) of the top-20 "
        "corpus words, z-scored across sources per word, Delta = mean "
        "|z_a - z_b| — THE authorship/style-attribution statistic, a "
        "different lens from text_source_divergence's distributional "
        "KL (Delta normalizes each word by its cross-source variance, "
        "so it reads style from function-word preferences rather than "
        "topic mass; the mean is emitted as exact micro-units — a round-6 "
        "double hit a .5 representability tie between engines). Per-term "
        "|z_a - z_b| is quantized to exact 1e-6 "
        "int64s before summing (the logprob device — double summation "
        "order never leaks). ONE corpus tokenize pass; everything after "
        "lives on the bounded 20-source x 20-word grid (the pair join "
        "is 400 x 20 rows). Zero-variance words are excluded by the "
        "exact integer predicate ns*sxx > sx^2. Reference parity: "
        "extension surface (SURVEY.md §2.B text analysis).",
)
def text_burrows_delta_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("source", F.explode(tokens(F.col("text"))).alias("w"))
    cnt = tok.groupBy("source", "w").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    ).localCheckpoint(eager=True)  # feeds topw / srctot / grid
    wtot = cnt.groupBy("w").agg(F.sum("c").alias("tot"))
    topw = (
        wtot.withColumn(
            "rn",
            F.row_number().over(Window.orderBy(F.col("tot").desc(), "w")),
        )
        .where(F.col("rn") <= 20)
        .select("w")
    )
    srctot = cnt.groupBy("source").agg(F.sum("c").cast("long").alias("n"))
    grid = (
        srctot.crossJoin(maybe_broadcast(topw))
        .join(cnt, ["source", "w"], "left")
        .select(
            "source",
            "w",
            F.expr(
                "CAST(COALESCE(c, 0) * 1000000 DIV n AS BIGINT)"
            ).alias("ppm"),
        )
    )
    wstat = grid.groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("ns"),
        F.sum("ppm").cast("long").alias("sx"),
        F.sum(F.col("ppm") * F.col("ppm")).cast("long").alias("sxx"),
    )
    z = (
        grid.join(maybe_broadcast(wstat), "w")
        .where(F.col("sxx") * F.col("ns") > F.col("sx") * F.col("sx"))
        .select(
            "source",
            "w",
            (
                (F.col("ppm") - F.col("sx").cast("double") / F.col("ns"))
                / F.sqrt(
                    (
                        F.col("sxx")
                        - F.col("sx").cast("double") * F.col("sx") / F.col("ns")
                    )
                    / F.col("ns")
                )
            ).alias("z"),
        )
    )
    a = z.select(
        F.col("source").alias("source_a"), "w", F.col("z").alias("za")
    )
    b = z.select(
        F.col("source").alias("source_b"), "w", F.col("z").alias("zb")
    )
    pairs = (
        a.join(maybe_broadcast(b), "w")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum(
                F.round(F.abs(F.col("za") - F.col("zb")) * 1000000).cast(
                    "long"
                )
            )
            .cast("long")
            .alias("delta_sum_micro"),
        )
    )
    return pairs.select(
        "source_a",
        "source_b",
        "n_words",
        "delta_sum_micro",
        F.expr(
            "CAST(CAST(delta_sum_micro AS DECIMAL(38,0)) DIV n_words "
            "AS BIGINT)"
        ).alias("delta_avg_micro"),
    )


# --------------------------------------------------------------------------
# Simpson lexical diversity — round-9 late addition


@register(
    "text_simpson_lexical_diversity",
    oracle=f"""
    WITH tf AS (
        SELECT source, term, CAST(COUNT(*) AS BIGINT) AS c
        FROM (SELECT source, unnest({_TOKS}) AS term FROM documents)
        GROUP BY source, term
    ),
    s AS (
        SELECT source,
               CAST(SUM(c) AS BIGINT) AS n_tokens,
               CAST(COUNT(*) AS BIGINT) AS n_types,
               CAST(SUM(c * (c - 1)) AS BIGINT) AS sum_cc1
        FROM tf GROUP BY source
    )
    SELECT source, n_tokens, n_types,
           CAST(CAST(sum_cc1 AS HUGEINT) * 1000000
                // (CAST(n_tokens AS HUGEINT) * (n_tokens - 1)) AS BIGINT)
               AS simpson_d_ppm,
           CAST(1000000 - CAST(sum_cc1 AS HUGEINT) * 1000000
                // (CAST(n_tokens AS HUGEINT) * (n_tokens - 1)) AS BIGINT)
               AS diversity_ppm
    FROM s
    """,
    doc="Simpson's lexical diversity per source shard: D = sum c(c-1) / "
        "(N(N-1)) is the probability two tokens drawn without "
        "replacement are the same type; 1-D is the diversity index — "
        "the EXACT-RATIONAL counterpart of text_token_entropy (Shannon "
        "needs log quantization; Simpson needs none), and the corpus-QA "
        "signal least sensitive to the long tail (it weights by "
        "frequency squared, so boilerplate domination shows up "
        "immediately). All integers: one HUGEINT cross-multiplication, "
        "one ppm floor division. Plan: one token explode, two hash "
        "aggregates ((source, term) then source) — same linear shape "
        "as text_token_entropy; no windows, no joins. Reference "
        "parity: extension surface (SURVEY.md §2.B text rows).",
)
def text_simpson_lexical_diversity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select("source", F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    s = tf.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(F.col("c") * (F.col("c") - 1)).cast("long").alias("sum_cc1"),
    )
    return s.select(
        "source",
        "n_tokens",
        "n_types",
        F.expr(
            "CAST(CAST(sum_cc1 AS DECIMAL(38,0)) * 1000000 "
            "DIV (CAST(n_tokens AS DECIMAL(38,0)) * (n_tokens - 1)) "
            "AS BIGINT)"
        ).alias("simpson_d_ppm"),
        F.expr(
            "CAST(1000000 - CAST(sum_cc1 AS DECIMAL(38,0)) * 1000000 "
            "DIV (CAST(n_tokens AS DECIMAL(38,0)) * (n_tokens - 1)) "
            "AS BIGINT)"
        ).alias("diversity_ppm"),
    )


# --------------------------------------------------------------------------
# Multinomial naive Bayes language classifier — round-9 late addition


@register(
    "ml_multinomial_nb_lang",
    oracle=f"""
    WITH tf AS (
        SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM (SELECT doc_id, unnest({_TOKS}) AS term FROM documents)
        GROUP BY doc_id, term
    ),
    docs AS (SELECT doc_id, lang FROM documents),
    langs AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS d_l,
               CAST(row_number() OVER (ORDER BY lang) AS BIGINT) AS langid
        FROM docs GROUP BY lang
    ),
    clt AS (
        SELECT d.lang, t.term, CAST(SUM(t.cnt) AS BIGINT) AS c
        FROM tf t JOIN docs d USING (doc_id)
        GROUP BY d.lang, t.term
    ),
    nl AS (
        SELECT lang, CAST(SUM(c) AS BIGINT) AS n_l FROM clt GROUP BY lang
    ),
    vocab AS (SELECT DISTINCT term FROM tf),
    vsize AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM vocab),
    dtot AS (SELECT CAST(COUNT(*) AS BIGINT) AS d_all FROM docs),
    grid AS (
        SELECT l.lang, l.langid, vb.term,
               CAST(round((log2(CAST(COALESCE(c.c, 0) + 1 AS DOUBLE))
                           - log2(CAST(n.n_l + vs.v AS DOUBLE))) * 1000000)
                    AS BIGINT) AS logp_micro
        FROM langs l
        CROSS JOIN vocab vb
        CROSS JOIN vsize vs
        JOIN nl n ON n.lang = l.lang
        LEFT JOIN clt c ON c.lang = l.lang AND c.term = vb.term
    ),
    prior AS (
        SELECT l.lang, l.langid,
               CAST(round((log2(CAST(l.d_l AS DOUBLE))
                           - log2(CAST(dt.d_all AS DOUBLE))) * 1000000)
                    AS BIGINT) AS prior_micro
        FROM langs l CROSS JOIN dtot dt
    ),
    score AS (
        SELECT t.doc_id, g.lang, g.langid,
               p.prior_micro + CAST(SUM(t.cnt * g.logp_micro) AS BIGINT)
                   AS s
        FROM tf t
        JOIN grid g ON g.term = t.term
        JOIN prior p ON p.lang = g.lang
        GROUP BY t.doc_id, g.lang, g.langid, p.prior_micro
    ),
    pred AS (
        SELECT doc_id, arg_max(lang, s * 64 - langid) AS pred_lang
        FROM score GROUP BY doc_id
    )
    SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(count_if(p.pred_lang = d.lang) AS BIGINT) AS n_correct,
           CAST(count_if(p.pred_lang = d.lang) * 1000000 // COUNT(*)
                AS BIGINT) AS acc_ppm
    FROM docs d JOIN pred p USING (doc_id)
    GROUP BY d.lang
    """,
    doc="Multinomial naive Bayes language classifier, trained and "
        "resubstitution-evaluated entirely in-plan: per-(lang, term) "
        "Laplace-smoothed log-likelihoods log2((c+1)/(N_l+V)) and "
        "log-priors log2(d_l/D), each quantized to exact micro-bit "
        "BIGINTs at the TERM level (the text_token_entropy device, so "
        "the per-doc score sums are order-independent and engine-"
        "identical), then argmax by the composite integer key "
        "s*64 - langid (deterministic smallest-langid tie-break, the "
        "ml_fleiss_kappa_panel device). The train->score->evaluate "
        "loop that usually needs an ML library is three hash "
        "aggregates and two bounded joins: the vocab x lang grid is "
        "|V| x |langs| (langs bounded; linear in vocabulary), scoring "
        "fans each doc-term row out by |langs| only. This is the "
        "canonical corpus-quality baseline (a CLD-style n-gram NB) "
        "next to the heuristic text_langid. Reference parity: "
        "extension surface (SURVEY.md §2.B text/ML rows).",
)
def ml_multinomial_nb_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    docs = d.select("doc_id", "lang")
    wl = Window.orderBy("lang")
    langs = (
        docs.groupBy("lang")
        .agg(F.count(F.lit(1)).cast("long").alias("d_l"))
        .select("lang", "d_l", F.row_number().over(wl).cast("long").alias("langid"))
    )
    clt = (
        tf.join(docs, "doc_id")
        .groupBy("lang", "term")
        .agg(F.sum("cnt").cast("long").alias("c"))
    )
    nl = clt.groupBy("lang").agg(F.sum("c").cast("long").alias("n_l"))
    vocab = tf.select("term").distinct()
    vsize = vocab.agg(F.count(F.lit(1)).cast("long").alias("v"))
    dtot = docs.agg(F.count(F.lit(1)).cast("long").alias("d_all"))
    grid = (
        vocab.crossJoin(F.broadcast(langs))
        .crossJoin(F.broadcast(vsize))
        .join(maybe_broadcast(nl), "lang")
        .join(clt, ["lang", "term"], "left")
        .select(
            "lang",
            "langid",
            "term",
            F.round(
                (
                    F.log2(F.coalesce(F.col("c"), F.lit(0)).cast("double") + 1)
                    - F.log2((F.col("n_l") + F.col("v")).cast("double"))
                )
                * 1_000_000
            )
            .cast("long")
            .alias("logp_micro"),
        )
    )
    prior = langs.crossJoin(F.broadcast(dtot)).select(
        "lang",
        F.round(
            (
                F.log2(F.col("d_l").cast("double"))
                - F.log2(F.col("d_all").cast("double"))
            )
            * 1_000_000
        )
        .cast("long")
        .alias("prior_micro"),
    )
    score = (
        tf.join(maybe_broadcast(grid), "term")
        .join(maybe_broadcast(prior), "lang")
        .groupBy("doc_id", "lang", "langid", "prior_micro")
        .agg(
            (
                F.first("prior_micro")
                + F.sum(F.col("cnt") * F.col("logp_micro"))
            )
            .cast("long")
            .alias("s")
        )
        .select("doc_id", "lang", "langid", "s")
    )
    pred = score.groupBy("doc_id").agg(
        F.max_by("lang", F.col("s") * 64 - F.col("langid")).alias(
            "pred_lang"
        )
    )
    return (
        docs.join(pred, "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.count_if(F.col("pred_lang") == F.col("lang"))
            .cast("long")
            .alias("n_correct"),
            F.expr(
                "CAST(count_if(pred_lang = lang) * 1000000 "
                "DIV COUNT(*) AS BIGINT)"
            ).alias("acc_ppm"),
        )
    )


@register(
    "text_script_profile",
    oracle=r"""
    WITH per AS (
        SELECT doc_id, lang,
               CAST(length(text) AS BIGINT) AS n_total,
               CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                    AS BIGINT) AS n_latin,
               CAST(length(regexp_replace(text, '[^0-9]', '', 'g'))
                    AS BIGINT) AS n_digit,
               CAST(length(regexp_replace(text, '[^一-鿿]', '', 'g'))
                    AS BIGINT) AS n_cjk,
               CAST(length(regexp_replace(text,
                    '[^À-ÿĀ-ſ]', '', 'g'))
                    AS BIGINT) AS n_latin_ext
        FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_total) AS BIGINT) AS n_chars,
           CAST(SUM(n_latin) * 1000000 // SUM(n_total) AS BIGINT)
               AS latin_ppm,
           CAST(SUM(n_digit) * 1000000 // SUM(n_total) AS BIGINT)
               AS digit_ppm,
           CAST(SUM(n_cjk) * 1000000 // SUM(n_total) AS BIGINT) AS cjk_ppm,
           CAST(SUM(n_latin_ext) * 1000000 // SUM(n_total) AS BIGINT)
               AS latin_ext_ppm
    FROM per GROUP BY lang
    """,
    doc="Unicode script profile per language shard: the share of ASCII "
        "Latin, digits, CJK-unified, and extended-Latin codepoints in "
        "each language's text — the script-consistency audit that "
        "catches mislabeled shards (a 'zh' shard with near-zero CJK "
        "share, an 'en' shard full of extended Latin) before language-ID "
        "models are trusted; the character-class complement of "
        "text_langid's lexicon vote and ml_multinomial_nb_lang's token "
        "model. Counting is length(regexp_replace(negated-class)) — "
        "pure JVM/RE2-common-subset regex on codepoints, no Python, no "
        "explode; the per-class shares are exact ppm floor divisions "
        "over per-lang integer sums. Plan: one documents scan, one "
        "5-row aggregate. Reference parity: extension surface "
        "(SURVEY.md §2.B text rows).",
)
def text_script_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")

    def cls_count(pattern: str):
        return F.length(
            F.regexp_replace(F.col("text"), pattern, "")
        ).cast("long")

    per = d.select(
        "lang",
        F.length("text").cast("long").alias("n_total"),
        cls_count(r"[^a-zA-Z]").alias("n_latin"),
        cls_count(r"[^0-9]").alias("n_digit"),
        cls_count("[^一-鿿]").alias("n_cjk"),
        cls_count("[^À-ÿĀ-ſ]").alias("n_latin_ext"),
    )
    return per.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_total").cast("long").alias("n_chars"),
        F.expr(
            "CAST(SUM(n_latin) * 1000000 DIV SUM(n_total) AS BIGINT)"
        ).alias("latin_ppm"),
        F.expr(
            "CAST(SUM(n_digit) * 1000000 DIV SUM(n_total) AS BIGINT)"
        ).alias("digit_ppm"),
        F.expr(
            "CAST(SUM(n_cjk) * 1000000 DIV SUM(n_total) AS BIGINT)"
        ).alias("cjk_ppm"),
        F.expr(
            "CAST(SUM(n_latin_ext) * 1000000 DIV SUM(n_total) AS BIGINT)"
        ).alias("latin_ext_ppm"),
    )


@register(
    "text_yule_k_by_source",
    oracle=f"""
    WITH occ AS (
        SELECT source, unnest({_TOKS}) AS tok FROM documents
    ),
    cnt AS (
        SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
        FROM occ GROUP BY source, tok
    )
    SELECT source,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(SUM(c * c) AS BIGINT) AS sum_freq_sq,
           round(CAST(SUM(c * c) - SUM(c) AS DOUBLE) * 10000
                 / (CAST(SUM(c) AS DOUBLE) * SUM(c)), 6) AS yule_k
    FROM cnt GROUP BY source
    """,
    doc="Yule's characteristic K per source: 10^4 * (sum(c^2) - N) / N^2 "
        "over the token frequency spectrum — the classic vocabulary-"
        "richness constant that, unlike raw type-token ratio, is "
        "(asymptotically) LENGTH-INVARIANT, so sources of very different "
        "sizes compare honestly; high K = repetitive/templated text, "
        "low K = lexically rich. Complements text_hapax_ratio_by_source "
        "(novelty tail) and text_simpson_lexical_diversity (which is "
        "K's normalized sibling — Yule's K ~ 10^4 * Simpson repeat "
        "rate) with the form corpus-linguistics tooling reports. Both "
        "moments are exact BIGINT sums over the (source, token) count "
        "table; the single division happens once in double. Plan: one "
        "tokenize-explode scan -> (source, token) count -> bounded "
        "per-source rollup — the same two-shuffle shape as every "
        "frequency-spectrum op here; c^2 stays in int64 to ~2e9 "
        "occurrences of one token per source. Reference parity: "
        "extension surface (SURVEY.md §2.B text rows).",
)
def text_yule_k_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wal_consumer_spark.functions.text import tokens

    d = load_table(spark, sf_dir, "documents")
    occ = d.select("source", F.explode(tokens(F.col("text"))).alias("tok"))
    cnt = occ.groupBy("source", "tok").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    n = F.sum("c").cast("long")
    sq = F.sum(F.col("c") * F.col("c")).cast("long")
    return cnt.groupBy("source").agg(
        n.alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        sq.alias("sum_freq_sq"),
        F.round(
            (sq - n).cast("double") * F.lit(10000)
            / (n.cast("double") * n),
            6,
        ).alias("yule_k"),
    )
