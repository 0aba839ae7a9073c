"""Text-analysis operators for large-scale training-data pipelines:
tokenization, quality scoring, language identification, document
fingerprinting. All pure Column expressions (JVM-side, whole-stage
codegen) — no Python UDFs anywhere in the hot path, so throughput is
scan-bound at any scale.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Small public stopword lists (top function words per language). Used
# for both quality's stopword-ratio and the language-ID heuristic.
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "you", "that"],
    "de": ["der", "die", "das", "und", "ist", "ich", "nicht", "mit", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "un", "une", "est", "que", "pour", "dans"],
    "es": ["el", "los", "las", "y", "que", "en", "un", "es", "por", "con"],
}

# language priority for deterministic argmax tie-breaks
LANG_PRIORITY = ["en", "de", "fr", "es"]

_PUNCT_CLASS = "[.,;:!?]"


def _conf_bytes(spark, key: str, default: int) -> int:
    """A size-suffixed Spark conf value ('134217728b', '128m') as int."""
    try:
        v = str(spark.conf.get(key)).strip().lower()
    except Exception:  # noqa: BLE001 — conf miss falls back to the default
        return default
    for suf, mult in (("kb", 1 << 10), ("mb", 1 << 20), ("gb", 1 << 30),
                      ("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30),
                      ("b", 1)):
        if v.endswith(suf):
            v = v[: -len(suf)]
            break
    else:
        mult = 1
    try:
        return int(v) * mult
    except ValueError:
        return default


_BARE_SCAN_NODES = frozenset({"Project", "Filter", "SubqueryAlias", "View", "Relation"})


def _is_bare_scan(df: DataFrame) -> bool:
    """True iff the analyzed logical plan is only projections/filters
    over relations — the shapes whose partitioning is fully determined
    by the scanned files. Anything else (Repartition, Join, Aggregate,
    Generate, LogicalRDD, ...) falls back to the exact RDD check in
    ``spread_small_scan``."""
    try:
        plan = df._jdf.queryExecution().analyzed().toString()
    except Exception:  # noqa: BLE001 — be conservative on any surprise
        return False
    for line in plan.splitlines():
        node = line.lstrip(" :+-").split(" ", 1)[0].split("[", 1)[0]
        if node and node not in _BARE_SCAN_NODES:
            return False
    return True


def spread_small_scan(df: DataFrame, *key_cols: str) -> DataFrame:
    """Spread CPU-bound per-row work (regex tokenization, hashing,
    shingling) across the session's cores. A small single-row-group
    parquet file arrives from the scan as ONE partition — Spark cannot
    split inside a row group — which would serialize every expression
    evaluated before the first shuffle. Repartition only when the scan
    is under-partitioned; at 100 TB the scan already carries >=
    defaultParallelism partitions and this inserts nothing.

    The under-partitioned test is decided from the scan's FILE
    inventory (``inputFiles`` + sizes vs the session's split configs),
    not ``df.rdd.getNumPartitions()``: materializing the RDD DAG just
    to count partitions costs ~150-400 ms of driver-side analysis per
    call at ANY scale (guide §5 — measured r16; this helper runs 1-3x
    per text/dedup query), and on a real table it forces the full file
    listing besides. The two regimes that matter are clear-cut from
    sizes alone — a table that packs into one split spreads, a table
    with >= one file (or one maxPartitionBytes of raw bytes) per core
    doesn't; only the ambiguous middle band (and non-file sources,
    e.g. in-memory test frames) falls back to the exact RDD check."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    # the file inventory speaks for the frame's partitioning ONLY when
    # the plan is a bare scan (projections/filters over one relation):
    # inputFiles() still reports the underlying files after a
    # .repartition()/join/aggregate, so the size heuristic would
    # wrongly re-spread a frame whose partitioning was already set
    # upstream (caught by the suite in r16: a deliberately widened
    # frame must pass through untouched). One py4j round trip (the
    # analyzed plan is already cached on the DataFrame).
    try:
        files = df.inputFiles() if _is_bare_scan(df) else []
    except Exception:  # noqa: BLE001 — non-file plans use the exact path
        files = []
    if files:
        if len(files) >= target:
            return df  # every file yields at least one scan partition
        try:
            from urllib.parse import unquote, urlparse

            sizes = [
                os.path.getsize(unquote(urlparse(f).path)) for f in files
            ]
        except OSError:
            sizes = None
        if sizes is not None:
            max_pb = _conf_bytes(
                spark, "spark.sql.files.maxPartitionBytes", 128 << 20
            )
            open_cost = _conf_bytes(
                spark, "spark.sql.files.openCostInBytes", 4 << 20
            )
            if sum(sizes) + open_cost * len(files) <= max_pb:
                # the whole scan packs into ONE split — under-partitioned
                # for any multi-core session
                return (
                    df.repartition(target, *key_cols)
                    if key_cols
                    else df.repartition(target)
                )
            if sum(sizes) >= target * max_pb:
                return df  # at least target splits by byte range
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target, *key_cols) if key_cols else df.repartition(target)
    return df


# --- single-expr SQL spellings of the hot token builders (r16) -------
#
# Building these Column trees through the pyspark functions API costs
# one py4j round trip PER NODE — measured ~70-100 ms per
# word_ngram_hashes call and ~0.5 s of pure driver time per
# contamination/minhash query invocation (guide §5: driver overhead).
# When the input is a plain column NAME, the whole tree is instead
# handed to the JVM as ONE ``F.expr`` string (a single round trip +
# a fast SQL parse). The SQL spells the IDENTICAL function tree, so
# every downstream value (token arrays, gram structs, xxhash64
# shingles) is bit-identical — pinned by
# tests/test_training_ops.py::test_expr_fastpath_parity. Column-typed
# inputs keep the functions-API path unchanged.
#
# The whitespace regex is spelled concat(char(92), 's+') — i.e. '\s+'
# without any string-literal escape — so the expression parses the
# same under either value of spark.sql.parser.escapedStringLiterals
# (the registry must behave identically on foreign driver sessions).
_WS_PATTERN_SQL = "concat(char(92), 's+')"


def _quote_ident(name: str) -> str:
    return "`" + name.replace("`", "``") + "`"


def _tokens_sql(quoted: str) -> str:
    return f"filter(split(lower({quoted}), {_WS_PATTERN_SQL}), x -> x != '')"


def _zipped_grams_sql(quoted: str, n: int) -> str:
    toks = _tokens_sql(quoted)
    cnt = f"greatest(size({toks}) - {n - 1}, 0)"
    slices = ", ".join(f"slice({toks}, {k + 1}, {cnt})" for k in range(n))
    return f"arrays_zip({slices})"


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of lowercased text, empty strings removed."""
    if isinstance(col, str):
        return F.expr(_tokens_sql(_quote_ident(col)))
    return F.filter(F.split(F.lower(col), r"\s+"), lambda x: x != "")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def zipped_token_grams(col: Column | str, n: int) -> Column:
    """n-gram token windows via n SHIFTED SLICES zipped together — the
    building block for every token-gram transform. HOF lambdas run on
    the interpreted expression path with NO common-subexpression
    elimination, so a per-position ``F.slice(tokens(col), i+1, n)``
    inside a lambda re-runs lower+regexp-split+filter PER ELEMENT —
    O(tokens) tokenizations per row, measured 4-6x slower on the
    shingle-into-column-then-explode shape. Zipping n shifted copies
    evaluates the tokenization O(n) times per ROW; the consuming lambda
    only reads its own element's struct fields (named "0"… "n-1").
    Element i is exactly (toks[i], …, toks[i+n-1]). Clamped to a
    non-negative slice length so docs with < n tokens yield an empty
    array instead of a runtime error — callers' when(size>=n)/filter
    guards stay purely semantic (empty-result) gates."""
    if isinstance(col, str):
        return F.expr(_zipped_grams_sql(_quote_ident(col), n))
    toks = tokens(col)
    cnt = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    return F.arrays_zip(*[F.slice(toks, k + 1, cnt) for k in range(n)])


BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def bpe_ish_token_count(col: Column | str) -> Column:
    """Sub-word-ish token count: count matches of letter runs, digit
    runs, and symbol runs — the shape of a BPE pre-tokenizer's split
    (GPT-2's pattern, simplified), a cheap deterministic proxy for
    token budgets. Match-based (no lookarounds) so it runs on RE2
    engines too and the oracle can reproduce it exactly."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(BPE_ISH_PATTERN))


def stopword_hits(col: Column | str, lang: str) -> Column:
    """Non-distinct count of stopword occurrences for one language."""
    words = STOPWORDS[lang]
    return F.size(F.filter(tokens(col), lambda x: x.isin(*words)))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append deterministic per-document quality signals:
    n_chars_obs, n_tokens, punct_ratio, stopword_ratio, mean_token_len,
    and a composite quality_score in [0,1]. The formula is fixed and
    mirrored in the oracle SQL — see queries_text.text_quality_scores."""
    c = F.col(text_col)
    toks = tokens(c)
    n_chars = F.length(c).cast("double")
    n_tokens = F.size(toks).cast("double")
    n_punct = F.size(F.regexp_extract_all(c, F.lit(_PUNCT_CLASS), F.lit(0))).cast("double")
    sw = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS["en"]))).cast("double")
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, sw / n_tokens).otherwise(F.lit(0.0))
    mean_tok = F.when(n_tokens > 0, (n_chars - (n_tokens - 1)) / n_tokens).otherwise(
        F.lit(0.0)
    )
    length_score = F.least(n_tokens / F.lit(100.0), F.lit(1.0))
    score = (
        F.lit(0.4) * length_score
        + F.lit(0.3) * (F.lit(1.0) - F.least(punct_ratio * 10, F.lit(1.0)))
        + F.lit(0.3) * F.least(stop_ratio * 4, F.lit(1.0))
    )
    return (
        df.withColumn("n_chars_obs", n_chars)
        .withColumn("n_tokens", n_tokens)
        .withColumn("punct_ratio", punct_ratio)
        .withColumn("stopword_ratio", stop_ratio)
        .withColumn("mean_token_len", mean_tok)
        .withColumn("quality_score", score)
    )


_CJK_CLASS = "[一-鿿]"

# --------------------------------------------------------- trigram language ID
#
# Cavnar & Trenkle 1994 ("N-Gram-Based Text Categorization", public
# method): a language is characterized by the RANK ORDER of its most
# frequent character n-grams; a document is classified by the language
# whose rank profile is closest under the "out-of-place" distance
# (sum over the document's top n-grams of |doc rank - profile rank|,
# with a fixed maximum penalty for n-grams absent from the profile).
#
# Profiles are computed AT IMPORT from the seed paragraphs below —
# plain-prose samples written for this engine, one per language — and
# shipped to executors as a small broadcast table (4 langs × 200
# trigrams). Classification is pure DataFrame ops: one explode +
# count shuffle keyed on the doc id (no skew), a per-doc rank window,
# a broadcast profile join, one argmin. No Python in the hot path.

LANG_SEEDS: dict[str, str] = {
    "en": (
        "the quick brown fox jumps over the lazy dog. it was the best of "
        "times and it was the worst of times. all happy families are alike "
        "but every unhappy family is unhappy in its own way. to be or not "
        "to be that is the question. she sells sea shells by the sea shore "
        "and the rain in spain stays mainly in the plain. we hold these "
        "truths to be self evident that all people are created equal. this "
        "is the story of a house that was built many years ago near the "
        "river and the people who lived there with their children."
    ),
    "de": (
        "der schnelle braune fuchs springt über den faulen hund. es war "
        "einmal ein kleines mädchen das mit seiner mutter in einem großen "
        "wald wohnte. alle glücklichen familien sind einander ähnlich. sein "
        "oder nicht sein das ist hier die frage. ich weiß nicht was soll es "
        "bedeuten dass ich so traurig bin. die würde des menschen ist "
        "unantastbar und das wetter ist heute wieder schön. wir fahren mit "
        "dem zug in die stadt und kaufen frisches brot und milch für das "
        "frühstück am nächsten morgen."
    ),
    "fr": (
        "le rapide renard brun saute par dessus le chien paresseux. il "
        "était une fois une petite fille qui vivait avec sa mère dans une "
        "grande forêt. toutes les familles heureuses se ressemblent. être "
        "ou ne pas être telle est la question. je ne sais pas pourquoi je "
        "suis si triste aujourd hui. la liberté consiste à pouvoir faire "
        "tout ce qui ne nuit pas aux autres. nous allons à la ville en "
        "train et nous achetons du pain frais et du lait pour le petit "
        "déjeuner du lendemain matin."
    ),
    "es": (
        "el rápido zorro marrón salta sobre el perro perezoso. érase una "
        "vez una niña pequeña que vivía con su madre en un gran bosque. "
        "todas las familias felices se parecen unas a otras. ser o no ser "
        "esa es la cuestión. no sé por qué estoy tan triste hoy. la "
        "libertad consiste en poder hacer todo aquello que no perjudique a "
        "los demás. vamos a la ciudad en tren y compramos pan fresco y "
        "leche para el desayuno de la mañana siguiente."
    ),
}

PROFILE_SIZE = 200
DOC_TOP_TRIGRAMS = 120


def _trigram_profile(seed: str, size: int = PROFILE_SIZE) -> dict[str, int]:
    """Rank profile (trigram -> 1-based rank) of the ``size`` most
    frequent character trigrams of ``seed``, space-padded, ties broken
    lexicographically for determinism. Python-side only — the engines
    consume the RESULT as literal data, so this normalization never
    needs cross-engine regex parity."""
    from collections import Counter

    s = "".join(ch if ch.isalpha() else " " for ch in seed.lower())
    s = " " + " ".join(s.split()) + " "
    counts = Counter(s[i : i + 3] for i in range(len(s) - 2))
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:size]
    return {tg: r + 1 for r, (tg, _) in enumerate(ranked)}


LANG_PROFILES: dict[str, dict[str, int]] = {
    lang: _trigram_profile(seed) for lang, seed in LANG_SEEDS.items()
}


def language_id_trigram(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "lang_pred",
) -> DataFrame:
    """Character-trigram rank-profile language ID (Cavnar-Trenkle; see
    module comment). Normalization shared exactly with the oracle SQL:
    lowercase, collapse non-letter runs ([^\\p{L}]+) to single spaces,
    trim, pad with one space each side; trigrams are the length-3
    substrings. Per doc the top ``DOC_TOP_TRIGRAMS`` trigrams by
    (count desc, trigram asc) are scored against each profile with
    out-of-place distance (absent trigram = ``PROFILE_SIZE`` penalty);
    argmin wins, ties broken by ``LANG_PRIORITY``. The CJK script gate
    still runs first (a Latin-trigram profile cannot see unsegmented
    Chinese) and trigram-less documents come back ``und``."""
    spark = df.sparkSession
    prof = spark.createDataFrame(
        [(l, tg, r) for l, p in LANG_PROFILES.items() for tg, r in p.items()],
        "plang string, tg string, prank int",
    )
    langs = spark.createDataFrame(
        [(l, i + 1) for i, l in enumerate(LANG_PRIORITY)],
        "plang string, priority int",
    )
    norm = F.concat(
        F.lit(" "),
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"[^\p{L}]+", " ")),
        F.lit(" "),
    )
    base = df.select(F.col(id_col).alias("__doc"), norm.alias("__s")).filter(
        F.length("__s") >= 3
    )
    tgs = base.select(
        "__doc",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("__s") - 2),
                lambda i: F.col("__s").substr(i, F.lit(3)),
            )
        ).alias("tg"),
    )
    from pyspark.sql import Window

    rank_w = Window.partitionBy("__doc").orderBy(F.desc("n"), F.asc("tg"))
    ranked = (
        tgs.groupBy("__doc", "tg")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("rd", F.row_number().over(rank_w))
        .filter(F.col("rd") <= DOC_TOP_TRIGRAMS)
        .select("__doc", "tg", "rd")
    )
    pick_w = Window.partitionBy("__doc").orderBy(F.asc("dist"), F.asc("priority"))
    best = (
        ranked.crossJoin(F.broadcast(langs))
        .join(F.broadcast(prof), ["plang", "tg"], "left")
        .withColumn(
            "pen",
            F.coalesce(F.abs(F.col("rd") - F.col("prank")), F.lit(PROFILE_SIZE)),
        )
        .groupBy("__doc", "plang", "priority")
        .agg(F.sum("pen").alias("dist"))
        .withColumn("rn", F.row_number().over(pick_w))
        .filter(F.col("rn") == 1)
        .select("__doc", F.col("plang").alias("__pred"))
    )
    joined = df.join(best, df[id_col] == best["__doc"], "left").drop("__doc")
    c = F.col(text_col)
    cjk = F.regexp_count(c, F.lit(_CJK_CLASS))
    pred = F.when(
        (cjk * 20 >= F.length(c)) & (F.length(c) > 0), F.lit("zh")
    ).otherwise(F.coalesce(F.col("__pred"), F.lit("und")))
    return joined.withColumn(out_col, pred).drop("__pred")


def language_id(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "lang_pred",
    method: str = "trigram",
) -> DataFrame:
    """Default language-ID entry point. Dispatches to the
    Cavnar-Trenkle trigram rank-profile classifier (the accurate
    path; :func:`language_id_trigram`); ``method="stopword"`` selects
    the cheaper single-pass stopword heuristic
    (:func:`language_id_stopword`) for scans that cannot afford the
    per-document trigram shuffle and don't need its accuracy."""
    if method == "stopword":
        return language_id_stopword(df, text_col=text_col, out_col=out_col)
    if method != "trigram":
        raise ValueError(f"unknown language_id method: {method!r}")
    return language_id_trigram(df, id_col=id_col, text_col=text_col, out_col=out_col)


def language_id_stopword(
    df: DataFrame, text_col: str = "text", out_col: str = "lang_pred"
) -> DataFrame:
    """Heuristic language ID, two tiers (deterministic, no model):

    1. script detection — ≥5% CJK-ideograph characters → ``zh``
       (whitespace-token stopwords can never see unsegmented Chinese);
       the integer comparison ``20·cjk ≥ n_chars`` keeps the gate
       exact across engines;
    2. stopword-hit argmax over the Latin-script lists with fixed
       priority tie-break. ``und`` when no list scores a hit.

    Still a heuristic stand-in for a real classifier (fastText-style),
    but honest about its coverage: scripts first, function words
    second."""
    c = F.col(text_col)
    hits = {lang: stopword_hits(text_col, lang) for lang in LANG_PRIORITY}
    best = F.greatest(*hits.values())
    expr = F.lit("und")
    for lang in reversed(LANG_PRIORITY):
        expr = F.when((hits[lang] == best) & (best > 0), F.lit(lang)).otherwise(expr)
    cjk = F.regexp_count(c, F.lit(_CJK_CLASS))
    # length > 0 guard: an empty document satisfies 0*20 >= 0 and would
    # otherwise be labeled zh instead of und
    expr = F.when(
        (cjk * 20 >= F.length(c)) & (F.length(c) > 0), F.lit("zh")
    ).otherwise(expr)
    return df.withColumn(out_col, expr)


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition signals per document (quality filters
    for training-data curation; see Rae et al. 2021 §A1.1):

    - ``top_token_fraction``: share of tokens that are the single most
      frequent token (high → degenerate/boilerplate text),
    - ``dup_bigram_fraction``: share of word bigrams that are repeats
      of an earlier bigram in the same document.

    Shape: one explode + (doc, token) count + per-doc aggregate for
    the token mode — all map-side combinable, shuffle keyed on the doc
    id — and a narrow higher-order-function pass for the bigram stats,
    joined back on the doc id. Everything is integer counting until
    the final division, so the emitted doubles are bit-identical
    across engines and partitionings."""
    base = spread_small_scan(
        df.select(F.col(id_col).alias("doc"), F.col(text_col).alias("__t")), "doc"
    )
    ex = base.select("doc", F.explode(tokens("__t")).alias("tok"))
    tok_counts = ex.groupBy("doc", "tok").agg(F.count(F.lit(1)).alias("n"))
    mode = tok_counts.groupBy("doc").agg(
        F.sum("n").alias("n_tokens"), F.max("n").alias("top_n")
    )
    toks = tokens("__t")
    # shifted-slice zip, not per-position slices: a slice of the
    # tokens() EXPRESSION inside the lambda re-tokenizes per element
    # in the interpreted HOF path (see zipped_token_grams)
    bigrams = F.transform(
        zipped_token_grams("__t", 2),
        lambda s: F.concat_ws(" ", s["0"], s["1"]),
    )
    bg = base.select(
        "doc",
        F.when(F.size(toks) >= 2, F.size(toks) - 1).otherwise(0).alias("n_bigrams"),
        F.when(F.size(toks) >= 2, F.size(F.array_distinct(bigrams)))
        .otherwise(0)
        .alias("n_distinct_bigrams"),
    )
    return (
        mode.join(bg, "doc")
        .select(
            F.col("doc").alias(id_col),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            (F.col("top_n").cast("double") / F.col("n_tokens").cast("double")).alias(
                "top_token_fraction"
            ),
            F.when(
                F.col("n_bigrams") > 0,
                (F.col("n_bigrams") - F.col("n_distinct_bigrams")).cast("double")
                / F.col("n_bigrams").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_bigram_fraction"),
        )
    )


def vocab_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus-level vocabulary statistics: per token, total occurrences
    (term frequency) and number of documents containing it (document
    frequency) — the first step of tokenizer/vocab training and of
    stopword discovery at corpus scale.

    One explode feeding a single groupBy(token): both aggregates are
    map-side combinable, so the shuffle carries one row per (partition,
    token) — at 100 TB the reduce side is vocabulary-sized, not
    corpus-sized. Hot tokens are one row each after partial
    aggregation, so token skew never concentrates raw rows."""
    ex = spread_small_scan(
        df.select(F.col(id_col).alias("doc"), F.col(text_col).alias("__t")), "doc"
    ).select("doc", F.explode(tokens("__t")).alias("token"))
    return ex.groupBy("token").agg(
        F.count(F.lit(1)).alias("term_freq"),
        F.count_distinct("doc").alias("doc_freq"),
    )


def distinctive_terms(
    df: DataFrame, k: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Top-``k`` most distinctive terms per document: score = term
    frequency in the doc / document frequency in the corpus (the
    rational tf-idf variant — same ranking intent as tf·log(N/df)
    without a transcendental, so every engine computes the identical
    doubles and the ranking is exactly reproducible; ties break on the
    term ascending).

    Shape: one (doc, token) count, one token-keyed join against the
    corpus doc-frequency table (vocabulary-sized — broadcastable), one
    per-doc window. All three shuffles are on bounded keys."""
    from pyspark.sql import Window

    ex = spread_small_scan(
        df.select(F.col(id_col).alias("doc"), F.col(text_col).alias("__t")), "doc"
    ).select("doc", F.explode(tokens("__t")).alias("token"))
    tf = ex.groupBy("doc", "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = ex.select("doc", "token").distinct().groupBy("token").agg(
        F.count(F.lit(1)).alias("doc_freq")
    )
    w = Window.partitionBy("doc").orderBy(
        (F.col("tf").cast("double") / F.col("doc_freq").cast("double")).desc(),
        F.col("token").asc(),
    )
    return (
        tf.join(dfreq, "token")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("doc").alias(id_col),
            "token",
            F.col("tf").cast("long").alias("tf"),
            F.col("doc_freq").cast("long").alias("doc_freq"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def winnow_fingerprints(
    df: DataFrame,
    k: int = 3,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
    SIGMOD'03 — the MOSS algorithm): hash every ordered k-token gram,
    slide a window of ``w`` consecutive hashes, keep each window's
    minimum. Guarantees any shared run of ≥ w+k-1 tokens between two
    documents yields at least one shared fingerprint, at ~1/w the
    storage of all-gram hashing — the standard partial-overlap
    detector where whole-document hashes (``fingerprint_md5``) and
    set-overlap measures (MinHash) miss ordered substring reuse.

    Shape: explode grams to rows, hash each gram ONCE, take the window
    minimum with a per-document ROWS window ordered by gram position,
    distinct on (doc, fingerprint). One shuffle keyed by the doc id.
    An earlier all-Column spelling computed the window minima as a
    higher-order function over the gram-hash ARRAY — but a lambda that
    references an array-expression re-evaluates it per element, so the
    md5 pass ran once per window position: O(tokens²) hashing per
    document (the sf1 decade measured it at 93 s for 50k docs; this
    spelling is ~6 s). The hash is the portable md5-derived family, so
    any engine reproduces the exact fingerprint set."""
    base = spread_small_scan(
        df.select(F.col(id_col).alias("doc"), F.col(text_col).alias("__t")), "doc"
    )
    toks = tokens("__t")
    # shifted-slice zip (zipped_token_grams): per-position slices of
    # the tokens() expression would re-tokenize per element in the
    # interpreted HOF path
    grams = F.transform(
        zipped_token_grams("__t", k),
        lambda s: F.concat_ws(" ", *[s[str(i)] for i in range(k)]),
    )
    exploded = base.filter(F.size(toks) >= k + w - 1).select(
        "doc", F.posexplode(grams).alias("pos", "__g")
    )
    hashed = exploded.select(
        "doc",
        "pos",
        F.conv(
            F.substring(
                F.md5(F.encode(F.concat_ws("|", F.lit("0"), F.col("__g")), "UTF-8")),
                1,
                15,
            ),
            16,
            10,
        ).cast("long").alias("__h"),
    )
    win = Window.partitionBy("doc").orderBy("pos").rowsBetween(0, w - 1)
    return (
        hashed.select(
            "doc",
            F.min("__h").over(win).alias("fp"),
            F.count("__h").over(win).alias("__n"),
        )
        .filter(F.col("__n") == w)  # full windows only (j ≤ grams − w)
        .select(F.col("doc").alias(id_col), "fp")
        .distinct()
    )


def normalized(col: Column | str) -> Column:
    """Canonical text form for fingerprinting: lowercase, collapse
    whitespace runs, trim."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def fingerprint_md5(col: Column | str) -> Column:
    """Portable content fingerprint: md5 of the normalized text —
    identical in any engine, the key for exact dedup."""
    return F.md5(F.encode(normalized(col), "UTF-8"))


def fingerprint_xxhash(col: Column | str) -> Column:
    """Fast 64-bit fingerprint (xxhash64, JVM intrinsic) — the engine's
    internal dedup key when cross-engine portability isn't needed."""
    return F.xxhash64(normalized(col))


# RE2-safe patterns (no backrefs/lookaround) so Java regex (Spark) and
# RE2 (DuckDB, the oracle) match identically.
_PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
    "phone": r"\+?[0-9]{1,3}[-. ]?\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}",
}


def pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """PII scrubbing for training corpora: count and redact emails,
    IPv4 addresses, and phone numbers (RE2-safe patterns — identical
    matches under Java regex and RE2, so the pass is oracle-checkable).
    Adds ``n_<kind>`` count columns and replaces ``text_col`` with the
    redacted text (matches become ``<KIND>`` placeholders, applied
    email → ipv4 → phone so a later pattern never re-matches inside an
    earlier placeholder). Pure Column expressions — narrow,
    whole-stage-codegen, scan-bound at any scale."""
    out = df
    redacted = F.col(text_col)
    for kind, pat in _PII_PATTERNS.items():
        out = out.withColumn(
            f"n_{kind}",
            F.size(F.regexp_extract_all(text_col, F.lit(pat), F.lit(0))),
        )
        redacted = F.regexp_replace(redacted, pat, f"<{kind.upper()}>")
    return out.withColumn(text_col, redacted)


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 128,
    overlap_tokens: int = 16,
) -> DataFrame:
    """Split documents into overlapping token windows — the standard
    prep for context-bounded embedding / indexing of long documents.
    Chunk k covers tokens [k·stride, k·stride + chunk_tokens) with
    stride = chunk_tokens − overlap_tokens, so consecutive chunks share
    ``overlap_tokens`` tokens and every token appears in some chunk.
    Token TEXT is preserved verbatim (no lowercasing — chunks feed
    embedding/indexing, not fingerprinting); inter-token whitespace is
    normalized to single spaces, the inherent trade of token-boundary
    chunking. A tail window whose tokens are entirely contained in the
    previous chunk (n_tokens mod stride ≤ overlap) is NOT emitted —
    it would be a duplicate-content chunk downstream pays to embed.

    Output: (id, chunk_id, chunk_text, n_chunk_tokens), one row per
    chunk; empty documents produce no rows. Shape: tokenize once, one
    generator (posexplode of the start offsets) — a narrow map, no
    shuffle; chunk ids are ``start // stride`` (pure arithmetic, no
    window or ordinality needed), deterministic across partitionings
    and engines."""
    if overlap_tokens >= chunk_tokens:
        raise ValueError("overlap_tokens must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap_tokens
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = F.filter(F.split(c, r"\s+"), lambda x: x != "")  # case-preserving
    n = F.size(toks)
    starts = F.filter(
        F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride)),
        # drop start offsets past the end AND the degenerate tail whose
        # tokens [s, n) are all inside the previous chunk [s-stride,
        # s+overlap): contained iff n <= s + overlap
        lambda s: (s < n) & ((s == 0) | (n > s + overlap_tokens)),
    )
    base = df.select(
        F.col(id_col), toks.alias("__tk"), F.explode(starts).alias("__start")
    )
    return base.select(
        F.col(id_col),
        (F.col("__start") / stride).cast("int").alias("chunk_id"),
        F.concat_ws(
            " ", F.slice("__tk", F.col("__start") + 1, chunk_tokens)
        ).alias("chunk_text"),
        F.least(F.lit(chunk_tokens), F.size("__tk") - F.col("__start")).alias(
            "n_chunk_tokens"
        ),
    )


def _repeated_spans(
    df: DataFrame, id_col: str, text_col: str, k: int, min_docs: int,
    keep: str = "none", hash_windows: bool = False,
):
    """Shared pipeline for the repeated-span family: returns
    (base = (id, n_tokens), spans = (id, s, e)) where [s, e) are the
    maximal merged cross-document repeated k-token spans.

    ``keep='none'`` marks every occurrence of a repeated window (the
    boilerplate-strip reading: repetition itself disqualifies the
    content); ``keep='first'`` exempts each window's lowest doc id, so
    exactly one copy of every repeated passage survives corpus-wide —
    the published exact-substring dedup policy."""
    from pyspark.sql import Window

    toks = spread_small_scan(
        df.select(F.col(id_col).alias("id"), F.split(F.col(text_col), " ").alias("ts")),
        "id",
    )
    base = toks.select("id", F.size("ts").alias("n_tokens"), "ts")
    # sequence(0, n-k) is DESCENDING when n < k — guard before building.
    # hash_windows: the window key becomes xxhash64 of the token slice —
    # an 8-byte shuffle key instead of a ~k-word string (the PB-scale
    # path; a 64-bit collision can at worst mark one extra span, the
    # same accepted tradeoff as the minhash/simhash fast paths). The
    # string key stays the default for bit-exact cross-engine parity.
    win_expr = (
        f"transform(sequence(0, size(ts) - {k}), "
        f"i -> xxhash64(slice(ts, i + 1, {k})))"
        if hash_windows
        else f"transform(sequence(0, size(ts) - {k}), "
        f"i -> concat_ws(' ', slice(ts, i + 1, {k})))"
    )
    wins = base.filter(F.col("n_tokens") >= k).select(
        "id", F.posexplode(F.expr(win_expr)).alias("start", "w")
    )
    if keep not in ("none", "first"):
        raise ValueError(f"unknown keep policy: {keep!r}")
    bad = (
        wins.groupBy("w")
        .agg(F.countDistinct("id").alias("df"), F.min("id").alias("first_id"))
        .filter(F.col("df") >= min_docs)
        .select("w", "first_id")
    )
    if keep == "first":
        marked = (
            wins.join(bad, "w")
            .filter(F.col("id") != F.col("first_id"))
            .select("id", "start")
        )
    else:
        marked = wins.join(bad.select("w"), "w", "left_semi").select("id", "start")
    prev = (
        Window.partitionBy("id").orderBy("start")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    run = (
        Window.partitionBy("id").orderBy("start")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    spans = (
        marked.withColumn(
            "new_island",
            (
                F.col("start")
                > F.coalesce(F.max(F.col("start") + k).over(prev), F.lit(-1))
            ).cast("int"),
        )
        .withColumn("gid", F.sum("new_island").over(run))
        .groupBy("id", "gid")
        .agg(F.min("start").alias("s"), (F.max("start") + k).alias("e"))
    )
    return base.select("id", "n_tokens"), spans


def repeated_span_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    min_docs: int = 2,
    hash_windows: bool = False,
) -> DataFrame:
    """Cross-document repeated-span detection — the exact-substring
    side of dedup (the public train-data recipe: find k-token windows
    shared across documents, merge overlapping hits into maximal
    spans). Returns one row per document: ``n_tokens``, ``n_spans``
    (maximal repeated spans) and ``n_removed`` (tokens those spans
    cover; 0 for clean docs).

    Plan: windows are materialized per doc (posexplode over a
    transform/slice expression — ~k× the token bytes, the documented
    cost of substring-level dedup), counted per window STRING with a
    map-side-combined distinct-doc aggregate, and only windows whose
    doc-frequency reaches ``min_docs`` return to the docs via a
    left-semi join on the window string. Overlapping hits collapse via
    the gaps-and-islands pattern: one running-max window per doc over
    the (tiny) marked set — never over all tokens. The quadratic-free
    invariant: nothing ever compares document PAIRS; the join key is
    the window content, so cost follows total repeated volume.
    ``hash_windows=True`` is the PB-scale path: xxhash64 window keys
    (8 bytes through every shuffle) instead of k-word strings — span
    output is identical short of a 64-bit collision (parity-pinned in
    tests); the string key stays the default for bit-exact
    cross-engine oracle parity."""
    base, spans = _repeated_spans(
        df, id_col, text_col, k, min_docs, hash_windows=hash_windows
    )
    per_doc = spans.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.col("e") - F.col("s")).alias("n_removed"),
    )
    return (
        base.join(per_doc, "id", "left")
        .na.fill({"n_spans": 0, "n_removed": 0})
        .select(
            F.col("id").alias(id_col),
            "n_tokens",
            "n_spans",
            F.col("n_removed").cast("long").alias("n_removed"),
        )
    )


def excise_repeated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    min_docs: int = 2,
    keep: str = "none",
    hash_windows: bool = False,
) -> DataFrame:
    """Boilerplate excision: REMOVE every maximal cross-document
    repeated span found by ``repeated_span_stats`` from every document
    (navigation chrome, license headers, templated blurbs — content
    whose repetition is the signal it isn\'t content). Returns the
    input rows with ``text_col`` rewritten and ``n_removed`` attached.

    The span → token mapping stays array-native per document: covered
    positions are collected into one array per doc (a span list is
    tiny), and the token filter is a single higher-order-function
    expression — no per-token explode, no Python. Docs with no spans
    pass through with identical text. ``keep='first'`` switches to the
    published exact-substring dedup policy: each repeated window's
    lowest doc id keeps its copy, every other occurrence is excised."""
    _, spans = _repeated_spans(
        df, id_col, text_col, k, min_docs, keep=keep, hash_windows=hash_windows
    )
    cover = spans.groupBy("id").agg(
        F.flatten(F.collect_list(F.expr("sequence(s, e - 1)"))).alias("cov"),
        F.sum(F.col("e") - F.col("s")).cast("long").alias("n_removed"),
    )
    out = (
        df.join(cover, df[id_col] == cover["id"], "left")
        .drop("id")
        .withColumn("cov", F.coalesce(F.col("cov"), F.array().cast("array<int>")))
        .withColumn("n_removed", F.coalesce(F.col("n_removed"), F.lit(0)))
    )
    kept = F.expr(
        f"concat_ws(' ', "
        f"transform("
        f"  filter("
        f"    transform(split({text_col}, ' '), (t, i) -> struct(t AS t, i AS i)),"
        f"    s -> NOT array_contains(cov, s.i)),"
        f"  s -> s.t))"
    )
    return out.withColumn(text_col, kept).drop("cov")


def token_frequency_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    rare_count: int = 2,
) -> DataFrame:
    """Per-document corpus-frequency quality signals: the mean corpus
    term frequency of the doc's tokens (gibberish and OCR noise score
    low — every token is near-unique) and the share of rare tokens
    (corpus count ≤ ``rare_count``). The unigram-LM filtering idea with
    RATIONAL arithmetic instead of log-probabilities — same ranking
    intent, but every engine computes identical doubles (one division
    at the end), so the scores are exactly reproducible cross-engine.

    Skew-safe shape: tokens reduce to per-(doc, token) counts BEFORE
    joining the corpus vocabulary, so a stopword appearing a billion
    times joins as one row per document containing it, never a billion
    rows onto one reducer; the vocabulary join key is the token, the
    reduce side is vocabulary-sized."""
    ex = spread_small_scan(
        df.select(F.col(id_col).alias("doc"), F.col(text_col).alias("__t")), "doc"
    ).select("doc", F.explode(tokens("__t")).alias("token"))
    tf = ex.groupBy("doc", "token").agg(F.count(F.lit(1)).alias("tf"))
    freq = tf.groupBy("token").agg(F.sum("tf").alias("cnt"))
    total = freq.agg(F.sum("cnt").alias("n_total"))
    return (
        tf.join(freq, "token")
        .groupBy("doc")
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.sum(F.col("cnt") * F.col("tf")).alias("sum_cnt"),
            F.sum(F.when(F.col("cnt") <= rare_count, F.col("tf")).otherwise(0)).alias(
                "n_rare"
            ),
        )
        .join(F.broadcast(total))
        .select(
            F.col("doc").alias(id_col),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            (
                F.col("sum_cnt").cast("double")
                / (F.col("n_tokens") * F.col("n_total")).cast("double")
            ).alias("mean_tok_freq"),
            (F.col("n_rare").cast("double") / F.col("n_tokens").cast("double")).alias(
                "rare_ratio"
            ),
        )
    )
