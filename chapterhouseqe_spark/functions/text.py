"""Text-analysis column functions: language ID, quality scoring, token
counting, content fingerprinting.

All pure Column expressions (JVM-side, codegen-friendly) — at 100 TB
these run inside the scan stage with zero extra shuffles. Every function
is deliberately SQL-expressible so the DuckDB oracle can recompute it
exactly; hashes go through md5 (standardized across engines) rather than
engine-specific hash functions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# tiny per-language stopword marker sets for the n-gram/stopword heuristic
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "es": ("el", "la", "de", "y", "es"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "de", "et", "est"),
}


def _tokens(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def lc_tokens(text: Column) -> Column:
    """Lower-cased whitespace tokens — materialize this ONCE (a select
    boundary) when several scoring expressions share it: each Column
    function below otherwise embeds its own split(), and five scoring
    expressions over one document means five tokenizations per row."""
    return F.split(F.lower(F.trim(text)), r"\s+")


def token_count(text: Column) -> Column:
    """Whitespace token count (BIGINT)."""
    return F.size(_tokens(text)).cast("bigint")


def word_token_count(text: Column) -> Column:
    """BPE-ish token proxy: count of letter-runs, digit-runs, and other
    non-space symbols — ``[a-z]+|[0-9]+|[^a-z0-9\\s]`` over the lowered
    text. A cheap, deterministic stand-in for a real tokenizer's token
    count (the actual BPE vocab isn't available engine-side)."""
    return F.regexp_count(F.lower(text), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]")).cast(
        "bigint"
    )


def _marker_hits(text: Column, markers: tuple[str, ...]) -> Column:
    """How many tokens of ``text`` are in the marker set (term frequency)."""
    return marker_hits_from(_tokens(F.lower(text)), markers)


def marker_hits_from(lc_toks: Column, markers: tuple[str, ...]) -> Column:
    """Marker hits over an already-tokenized lower-cased array."""
    return F.size(F.filter(lc_toks, lambda tk: tk.isin(*markers))).cast("bigint")


def lang_id(text: Column) -> Column:
    """Stopword-marker language heuristic.

    Scores each candidate language by marker-token frequency; returns the
    argmax with a fixed alphabetical tiebreak, or 'und' when nothing hits.
    Deterministic and SQL-expressible (greatest + case chain).
    """
    return lang_id_from(lc_tokens(text))


def lang_id_from(lc_toks: Column) -> Column:
    """:func:`lang_id` over a materialized lower-cased token array."""
    scores = {lang: marker_hits_from(lc_toks, m) for lang, m in LANG_MARKERS.items()}
    best = F.greatest(*scores.values())
    # alphabetical order, first match wins (build reversed so earlier
    # languages take precedence) — mirror this exact rule in the oracle
    result = F.lit("und")
    for lang in sorted(scores, reverse=True):
        result = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(
            result
        )
    return result


def quality_score(text: Column, lc_toks: Column | None = None) -> Column:
    """Heuristic document quality in [0,1]: length band + alpha ratio +
    stopword presence. Same double arithmetic on both engines → exact.
    Pass a materialized ``lc_toks`` (see :func:`lc_tokens`) to avoid
    re-tokenizing when composing with other scoring expressions.
    """
    n_chars = F.length(text).cast("double")
    n_toks = (
        F.size(lc_toks) if lc_toks is not None else token_count(text)
    ).cast("double")
    alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", "")).cast("double")
    alpha_ratio = F.when(n_chars > 0, alpha / n_chars).otherwise(F.lit(0.0))
    len_band = (
        F.when((n_chars >= 100) & (n_chars <= 10000), F.lit(1.0))
        .when(n_chars >= 20, F.lit(0.5))
        .otherwise(F.lit(0.0))
    )
    stop_hits = (
        marker_hits_from(lc_toks, LANG_MARKERS["en"])
        if lc_toks is not None
        else _marker_hits(text, LANG_MARKERS["en"])
    ).cast("double")
    stop_ratio = F.when(n_toks > 0, stop_hits / n_toks).otherwise(F.lit(0.0))
    stop_band = (
        F.when(stop_ratio >= 0.05, F.lit(1.0))
        .when(stop_ratio > 0, F.lit(0.5))
        .otherwise(F.lit(0.0))
    )
    return (len_band * 0.4 + alpha_ratio * 0.3 + stop_band * 0.3).alias("quality")


def doc_fingerprint(text: Column) -> Column:
    """Normalization-stable content fingerprint: lower, collapse
    whitespace, strip punctuation, md5 → 60-bit BIGINT. Two documents
    differing only in case/spacing/punctuation share a fingerprint."""
    norm = F.regexp_replace(
        F.regexp_replace(F.lower(F.trim(text)), r"[^a-z0-9\s]", ""), r"\s+", " "
    )
    return F.conv(F.substring(F.md5(norm), 1, 15), 16, 10).cast("long")


def tfidf_top_terms(
    df: DataFrame, text_col: str, id_col: str, k: int = 5
) -> DataFrame:
    """Top-k TF-IDF terms per document — fully distributed, JVM-side.

    Smooth idf = ln((N+1)/(df_t+1)) + 1. Returns (doc_id, term, tf,
    df_t, rnk): the float score RANKS rows (deterministic across
    engines — distinct (tf, df_t) classes can never produce exactly
    equal real scores, and ties within a class break on the term) but is
    not emitted, so the output is engine-exact integers/strings.

    100 TB shape: tf is one (id, term)-keyed aggregation with map-side
    combine; document frequency aggregates the already-unique tf rows by
    term (vocabulary-sized, tiny vs corpus); the idf join is term-keyed
    (AQE broadcasts the vocab side when it fits); the final top-k is one
    id-keyed window. No driver-side state; the corpus is never collected.
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    n_docs = df.select(F.countDistinct(id_col).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "s",
            F.col("tf")
            * (F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df_t") + F.lit(1.0))) + F.lit(1.0)),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("s").desc(), F.col("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= k)
        .select("doc_id", "term", "tf", "df_t", "rnk")
    )


def ngram_repetition_counts(text: Column, k: int) -> tuple[Column, Column]:
    """(total, distinct) k-gram counts of a whitespace-tokenized text —
    the inputs to a Gopher-style duplicate-n-gram quality filter
    (repetitious boilerplate has distinct << total). Pure Column exprs
    inside the scan stage; both counts cast to long so they compare
    exactly against DuckDB's BIGINT len().

    Grams are built by zipping k SHIFTED SLICES of the token array
    (zip_with folds them pairwise), not by indexing per position: a
    per-index lambda over the raw split() re-tokenizes the document for
    every index once CollapseProject inlines the alias — the measured
    O(tokens²) trap from text_top_bigrams (PLANS.md round-3 pass). The
    shifted-slice form evaluates split() k times per row total and is
    immune to projection collapse. slice(toks, i, 0) is a valid empty
    slice, so texts shorter than k tokens yield zero grams with no
    special-casing.
    """
    from functools import reduce

    toks = _tokens(text)
    cnt = F.greatest(F.size(toks) - (k - 1), F.lit(0))
    shifted = [F.slice(toks, i + 1, cnt) for i in range(k)]
    grams = reduce(
        lambda acc, nxt: F.zip_with(
            acc, nxt, lambda x, y: F.concat_ws(" ", x, y)
        ),
        shifted,
    )
    return (
        F.size(grams).cast("long"),
        F.size(F.array_distinct(grams)).cast("long"),
    )


# ------------------------------------------------------------------ PII

# Redaction patterns shared verbatim with the DuckDB oracle: RE2-safe
# (no lookaround, no backreferences) so Java regex (Spark) and RE2
# (DuckDB) agree character-for-character.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    "phone": (r"\+?\d[\d -]{7,}\d", "[PHONE]"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
}


def pii_redact(text: Column, kinds: tuple[str, ...] = ("email", "phone", "ipv4")) -> Column:
    """Replace each PII pattern with its placeholder token.

    A chain of regexp_replace Column exprs — JVM-side, inside the scan
    stage, global replacement per pattern. Order matters (emails before
    phones, so digits inside an address aren't half-eaten); ``kinds``
    applies in the order given.
    """
    out = text
    for kind in kinds:
        pattern, token = PII_PATTERNS[kind]
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_count(text: Column, kind: str) -> Column:
    """Occurrences of one PII pattern (long, oracle: len(regexp_extract_all))."""
    pattern, _ = PII_PATTERNS[kind]
    return F.size(F.regexp_extract_all(text, F.lit(pattern), F.lit(0))).cast("long")


# URL canonicalization (r10 verdict item 6). ONE shared regex set —
# the oracle SQL and any future canonical-key consumer must use these
# exact patterns, so they live as named constants, not inline strings.
URL_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
# tracking params every production crawler strips: Google/Facebook
# click ids, utm_* campaign tags, bare ref
URL_TRACKING_RE = r"(utm_[A-Za-z0-9_]+|ref|fbclid|gclid)=[^&#]*"


def canonicalize_url(url: Column) -> Column:
    """Canonical form of a URL for dedup keys: lowercase scheme+host,
    strip the scheme's DEFAULT port (``:80`` only under http, ``:443``
    only under https — ``http://h:443`` is a real nonstandard port and
    survives), drop the fragment, remove tracking query params
    (:data:`URL_TRACKING_RE`), then tidy dangling ``?``/``&``.

    Pure built-in regexp chain inside the scan stage — no UDF, no
    shuffle; the patterns avoid backreferences and lookaround so the
    same expressions run verbatim in DuckDB's RE2 (with the ``'g'``
    flag, since DuckDB's regexp_replace is first-match by default
    where Spark's is global). Path/query case is preserved — only
    scheme and host are case-insensitive per RFC 3986 §6.2.2.1.
    """
    u = F.trim(url)
    scheme = F.lower(F.regexp_extract(u, URL_SCHEME_RE, 1))
    rest = F.regexp_replace(u, URL_SCHEME_RE, "")
    hostport = F.lower(F.regexp_extract(rest, r"^([^/?#]*)", 1))
    host = (
        F.when(
            scheme == "https", F.regexp_replace(hostport, r":443$", "")
        )
        .when(scheme == "http", F.regexp_replace(hostport, r":80$", ""))
        .otherwise(hostport)
    )
    tail = F.substring(rest, F.length(hostport) + F.lit(1), F.lit(2**30))
    tail = F.regexp_replace(tail, r"#.*$", "")
    # three-step tracking strip (global): non-first params with their
    # '&'; a first param followed by a survivor (keep the '?'); a
    # lone/last first param (drop the '?')
    tail = F.regexp_replace(tail, r"&" + URL_TRACKING_RE, "")
    tail = F.regexp_replace(tail, r"\?" + URL_TRACKING_RE + r"&", "?")
    tail = F.regexp_replace(tail, r"\?" + URL_TRACKING_RE + r"$", "")
    tail = F.regexp_replace(tail, r"[?&]$", "")
    return F.concat(scheme, F.lit("://"), host, tail)


# ------------------------------------------------------------------ BPE


def unigram_prob_scores(docs, text_col: str = "text", id_col: str = "doc_id"):
    """Corpus-trained unigram-LM quality score per document — the
    CCNet / Wikipedia-LM filtering signal (Wenzek et al. 2020), in an
    integer-exact formulation.

    Trains the LM on the corpus itself (token w → count(w)), then
    scores each document by its MEAN TOKEN PROBABILITY::

        mean_prob(doc) = (Σ_tokens count(w)) / (n_tokens · total)

    Documents full of rare/garbled tokens score low; natural prose
    scores high — rank by ``mean_prob`` and cut the tail, exactly like
    perplexity filtering but with every aggregate an exact BIGINT and
    ONE final double division (log-perplexity would sum per-token
    libm logs, whose order and last-ulp behavior are not portable
    across engines; the monotone mean-probability variant is).

    Returns (id_col, n_tokens, cnt_sum, mean_prob).

    100 TB shape: three combinable keyed shuffles — vocab groupBy(w),
    token⋈vocab on w (AQE broadcasts the vocab when it fits, else a
    plain hash join; the heavy-tail vocab of a web corpus may not),
    and the per-doc groupBy. The corpus is never collected; ``total``
    is a 1-row broadcast.
    """
    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("w"),
    ).filter(F.length("w") > 0)
    # three consumers, but deriving toks is ONE cheap split+explode —
    # an r13 A/B measured persist+materialize at +0.25s (sf0.1 warm
    # 0.69 -> 0.94s): the cache write costs more than two
    # re-derivations. Persist only what is reused AND expensive — see
    # bigram_prob_scores below, whose occurrence frame carries two
    # md5_int conversions per row and does win from the persist.
    vocab = toks.groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
    total = toks.agg(F.count(F.lit(1)).alias("total"))
    per_doc = (
        toks.join(vocab, "w")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("cnt").alias("cnt_sum"),
        )
    )
    return per_doc.crossJoin(F.broadcast(total)).select(
        F.col(id_col),
        F.col("n_tokens"),
        F.col("cnt_sum"),
        (
            F.col("cnt_sum").cast("double")
            / (F.col("n_tokens") * F.col("total")).cast("double")
        ).alias("mean_prob"),
    )


def word_freqs(docs, text_col: str = "text"):
    """The corpus collapsed to its word-frequency table — the shared
    first stage of every BPE step (one map-side-combining shuffle
    keyed on the word). Persist the result when several BPE stages
    consume it so the corpus scan runs once."""
    w = F.col("w")
    return (
        docs.select(
            F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("w")
        )
        .filter(F.length(w) > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def bpe_pair_counts(docs, text_col: str = "text", k: int = 20):
    """One BPE training iteration: the global adjacent-symbol-pair
    counts whose argmax is the next merge (Sennrich et al. 2016 —
    public algorithm; symbols are characters plus a terminal ``</w>``
    marker on each word).

    Returns the top-``k`` (pair, cnt) rows, cnt weighted by word
    frequency, ties broken on the pair string.

    100 TB shape — the classic BPE trick is visible in the plan: the
    corpus collapses to its WORD-FREQUENCY table first (one map-side-
    combining shuffle keyed on the word), so pair generation runs over
    |vocab| rows, not |corpus tokens|; a second combinable shuffle sums
    pair counts, and the top-k is a TakeOrderedAndProject. Every merge
    iteration after the first reruns only the (tiny) vocab→pair
    stage, never the corpus scan (see :func:`bpe_apply_top_merge`).
    """
    return pair_counts_from_word_freqs(word_freqs(docs, text_col), k)


def pair_counts_from_word_freqs(wf, k: int = 20):
    """Adjacent-pair counts over an existing (w, freq) frame — the
    vocab-sized second stage of :func:`bpe_pair_counts`."""
    w = F.col("w")
    n = F.length(w)
    idx = F.when(n >= 2, F.sequence(F.lit(1), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    inner = F.transform(
        idx,
        lambda i: F.concat(w.substr(i, F.lit(1)), F.lit(" "), w.substr(i + 1, F.lit(1))),
    )
    pairs = F.concat(
        inner, F.array(F.concat(w.substr(n, F.lit(1)), F.lit(" </w>")))
    )
    return (
        wf.select("freq", F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.sum("freq").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("pair"))
        .limit(k)
    )


def bpe_apply_top_merge(docs, text_col: str = "text", k: int = 20):
    """BPE training iteration TWO: apply the current top-1 merge to the
    symbol table, then recount adjacent pairs — the loop body that,
    iterated, yields the full merge list (Sennrich et al. 2016).

    Symbol strings use a DOUBLED-space delimiter (``'  a  b  </w>  '``)
    so one literal ``replace`` implements the leftmost-first,
    non-overlapping merge semantics exactly: the pattern
    ``' a  b '`` consumes one delimiter space on each side, leaving
    the neighbours' delimiters intact, so adjacent merge sites
    ("x y x y") both collapse in a single forward scan — the same
    result a per-word symbol loop would produce, but as one string op
    per VOCAB row (never per corpus token) in any engine.

    Returns the top-``k`` (pair, cnt) AFTER the merge — iteration 2's
    merge candidates. 100 TB shape: identical to
    :func:`bpe_pair_counts` (corpus → word-freq collapse first); the
    applied merge is a 1-row broadcast.
    """
    from pyspark import StorageLevel

    w = F.col("w")
    # ONE corpus scan: the word-frequency frame feeds both the top-1
    # pair choice and the symbol-table rewrite (persist, vocab-sized)
    wf = word_freqs(docs, text_col).persist(StorageLevel.MEMORY_AND_DISK)
    sym = F.concat(
        F.lit("  "),
        F.array_join(
            F.transform(F.sequence(F.lit(1), F.length(w)), lambda i: w.substr(i, F.lit(1))),
            "  ",
        ),
        F.lit("  </w>  "),
    )
    top1 = pair_counts_from_word_freqs(wf, k=1).select(F.col("pair").alias("p"))
    pattern = F.concat(
        F.lit(" "), F.replace(F.col("p"), F.lit(" "), F.lit("  ")), F.lit(" ")
    )
    replacement = F.concat(
        F.lit(" "), F.replace(F.col("p"), F.lit(" "), F.lit("")), F.lit(" ")
    )
    merged = (
        wf.select("freq", sym.alias("s"))
        .crossJoin(F.broadcast(top1))
        .select("freq", F.replace(F.col("s"), pattern, replacement).alias("s"))
    )
    tk = F.col("tk")
    n2 = F.size(tk) - 1
    idx = F.when(n2 >= 1, F.sequence(F.lit(1), n2)).otherwise(
        F.array().cast("array<int>")
    )
    pairs = F.transform(
        idx,
        lambda i: F.concat_ws(" ", F.element_at(tk, i), F.element_at(tk, i + 1)),
    )
    return (
        merged.select("freq", F.split(F.trim(F.col("s")), r"\s+").alias("tk"))
        .select("freq", F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.sum("freq").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("pair"))
        .limit(k)
    )


def pair_counts_from_symbols(symframe, k: int = 20):
    """Adjacent-pair counts over a (freq, s) symbol frame — the
    generic recount stage the BPE loop body iterates (``s`` uses the
    doubled-space delimiter convention of :func:`bpe_apply_top_merge`).
    """
    tk = F.col("tk")
    n2 = F.size(tk) - 1
    idx = F.when(n2 >= 1, F.sequence(F.lit(1), n2)).otherwise(
        F.array().cast("array<int>")
    )
    pairs = F.transform(
        idx,
        lambda i: F.concat_ws(" ", F.element_at(tk, i), F.element_at(tk, i + 1)),
    )
    return (
        symframe.select("freq", F.split(F.trim(F.col("s")), r"\s+").alias("tk"))
        .select("freq", F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.sum("freq").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("pair"))
        .limit(k)
    )


def bpe_train_merges(docs, text_col: str = "text", n_merges: int = 3):
    """The FULL BPE training loop (Sennrich et al. 2016): ``n_merges``
    iterations of count-pairs -> argmax -> apply-merge, returning the
    ordered merge table ``(step, pair, cnt)`` — the artifact a
    tokenizer trainer actually produces (merges.txt).

    Composes :func:`word_freqs` (the ONE corpus scan) with the
    doubled-space merge-apply of :func:`bpe_apply_top_merge`, iterated:
    every iteration's frames are |vocab|-sized, each intermediate
    symbol state is persisted so step i's argmax never recomputes
    steps 1..i-1, and each chosen merge enters the next rewrite as a
    1-row broadcast. Deterministic end-to-end (ties on the pair
    string), so the whole loop replays in SQL as unrolled CTEs — the
    same evidence technique as the Lloyd k-means trainer.

    100 TB: the corpus scan happens ONCE (word_freqs); all ``n``
    iterations run over the word-frequency table (|vocab| rows, MBs
    even for web-scale corpora). Real trainers run thousands of
    merges; the loop body cost is what matters, and it is
    corpus-independent after the first collapse.
    """
    from functools import reduce

    from pyspark import StorageLevel

    w = F.col("w")
    wf = word_freqs(docs, text_col).persist(StorageLevel.MEMORY_AND_DISK)
    sym = F.concat(
        F.lit("  "),
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), F.length(w)), lambda i: w.substr(i, F.lit(1))
            ),
            "  ",
        ),
        F.lit("  </w>  "),
    )
    state = wf.select("freq", sym.alias("s")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    steps = []
    for step in range(1, n_merges + 1):
        top1 = pair_counts_from_symbols(state, k=1)
        steps.append(
            top1.select(
                F.lit(step).cast("int").alias("step"), "pair", "cnt"
            )
        )
        p = top1.select(F.col("pair").alias("p"))
        pattern = F.concat(
            F.lit(" "), F.replace(F.col("p"), F.lit(" "), F.lit("  ")), F.lit(" ")
        )
        replacement = F.concat(
            F.lit(" "), F.replace(F.col("p"), F.lit(" "), F.lit("")), F.lit(" ")
        )
        state = (
            state.crossJoin(F.broadcast(p))
            .select("freq", F.replace(F.col("s"), pattern, replacement).alias("s"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
    return reduce(lambda a, b: a.unionAll(b), steps)


def bpe_encode_stats(docs, text_col: str = "text", n_merges: int = 3):
    """Encode the corpus under the first ``n_merges`` trained BPE
    merges and report the compression bookkeeping a tokenizer-training
    run watches: ONE row ``(n_words, vocab_size, total_tokens,
    total_chars)`` — token count falls as merges apply; the
    tokens-per-word and chars-per-token ratios derive from exact
    BIGINTs driver-side (or in SQL) with no float accumulation.

    Runs the same persisted-vocab training loop as
    :func:`bpe_train_merges` (one corpus scan), then aggregates the
    final symbol state weighted by word frequency: ``total_tokens =
    sum(freq * |symbols(word)|)``. The corpus is never re-touched for
    encoding — a word's token count under a merge list depends only on
    the word, which is the entire reason production BPE encoders
    memoize per word.
    """
    from pyspark import StorageLevel

    w = F.col("w")
    wf = word_freqs(docs, text_col).persist(StorageLevel.MEMORY_AND_DISK)
    sym = F.concat(
        F.lit("  "),
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), F.length(w)), lambda i: w.substr(i, F.lit(1))
            ),
            "  ",
        ),
        F.lit("  </w>  "),
    )
    state = wf.select(
        "freq", F.length(w).alias("n_chars"), sym.alias("s")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    for _ in range(n_merges):
        top1 = pair_counts_from_symbols(state, k=1).select(
            F.col("pair").alias("p")
        )
        pattern = F.concat(
            F.lit(" "), F.replace(F.col("p"), F.lit(" "), F.lit("  ")), F.lit(" ")
        )
        replacement = F.concat(
            F.lit(" "), F.replace(F.col("p"), F.lit(" "), F.lit("")), F.lit(" ")
        )
        state = (
            state.crossJoin(F.broadcast(top1))
            .select(
                "freq",
                "n_chars",
                F.replace(F.col("s"), pattern, replacement).alias("s"),
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
    n_tok = F.size(F.split(F.trim(F.col("s")), r"\s+"))
    return state.agg(
        F.sum("freq").alias("n_words"),
        F.count(F.lit(1)).alias("vocab_size"),
        F.sum(F.col("freq") * n_tok.cast("bigint")).alias("total_tokens"),
        F.sum(F.col("freq") * F.col("n_chars")).alias("total_chars"),
    )


def bigram_prob_scores(docs, text_col: str = "text", id_col: str = "doc_id"):
    """Corpus-trained BIGRAM-LM quality score per document — the
    next-order upgrade of :func:`unigram_prob_scores` (CCNet's KenLM
    filter is a 5-gram LM; a bigram captures the word-order signal a
    unigram cannot: shuffled or boilerplate-spliced text has common
    WORDS but rare TRANSITIONS).

    Score is the micro-averaged conditional bigram probability::

        score(doc) = (Σ_doc-bigrams cnt(w1 w2)) / (Σ_doc-bigrams cnt(w1))

    — a ratio of two exact BIGINT sums with ONE final double division,
    the same portability discipline as the unigram variant (per-bigram
    division then averaging would sum engine-rounded doubles;
    log-probabilities would sum libm logs — neither replays exactly).
    cnt(w1) is the count of w1 AS A BIGRAM PREFIX (i.e. followed by
    anything), so the per-bigram ratio cnt(w1 w2)/cnt(w1) is a true
    conditional probability and the micro-average is its
    occurrence-weighted mean.

    Returns (id_col, n_bigrams, joint_sum, prefix_sum, bigram_score)
    for documents with >= 2 tokens.

    100 TB shape: tokenize once; bigrams form inside the scan stage
    (slide over the token array, no self-join); two combinable keyed
    shuffles build the bigram and prefix tables; the score join is
    keyed on the md5 bigram key (compact, skew on viral bigrams
    concentrates count ROWS not corpus rows); one per-doc groupBy.
    """
    from chapterhouseqe_spark.queries.registry import md5_int

    tk = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda x: F.length(x) > 0,
    )
    n = F.size(F.col("tk"))
    bigrams = (
        docs.select(F.col(id_col), tk.alias("tk"))
        .filter(n >= 2)
        .select(
            id_col,
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), n - 1),
                    lambda i: F.struct(
                        F.concat_ws(
                            " ",
                            F.element_at(F.col("tk"), i),
                            F.element_at(F.col("tk"), i + 1),
                        ).alias("bg"),
                        F.element_at(F.col("tk"), i).alias("w1"),
                    ),
                )
            ).alias("p"),
        )
        .select(id_col, md5_int(F.col("p.bg")).alias("g"), md5_int(F.col("p.w1")).alias("g1"))
    )
    # THREE consumers read this frame (joint, prefix, and the score
    # join's occurrence side), and deriving it costs the tokenize +
    # bigram explode + two md5_int conversions per occurrence — the
    # multi-reference re-evaluation antipattern. Persist + eager
    # materialization (the count doubles as the action so the two
    # aggregations below never race the lazy persist): 22.8s -> 15.5s
    # at sf1, r13 optimization.
    from pyspark import StorageLevel

    bigrams = bigrams.persist(StorageLevel.MEMORY_AND_DISK)
    bigrams.count()
    joint = bigrams.groupBy("g").agg(F.count(F.lit(1)).alias("cnt_bg"))
    prefix = bigrams.groupBy("g1").agg(F.count(F.lit(1)).alias("cnt_w1"))
    return (
        bigrams.join(joint, "g")
        .join(prefix, "g1")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("cnt_bg").alias("joint_sum"),
            F.sum("cnt_w1").alias("prefix_sum"),
        )
        .select(
            id_col,
            "n_bigrams",
            "joint_sum",
            "prefix_sum",
            (
                F.col("joint_sum").cast("double")
                / F.col("prefix_sum").cast("double")
            ).alias("bigram_score"),
        )
    )


def gopher_quality_rules(docs, text_col: str = "text", id_col: str = "doc_id"):
    """The Gopher rule-based quality battery (Rae et al. 2021, App. A)
    computed per document in ONE narrow pass — no shuffle at all until
    the caller aggregates: every metric is an expression over the
    tokenized text, so the whole battery runs inside the scan stage.

    Returns per document: ``n_words``, ``mean_word_len`` (chars/word),
    ``symbol_word_ratio`` (# and ellipsis occurrences per word),
    ``alpha_word_frac`` (words containing at least one letter),
    ``dup_line_frac`` (repeated lines among newline-split lines), and
    ``passes`` — the conjunction of the paper's bounds (50 <= words <=
    100k, 3 <= mean len <= 10, symbol ratio < 0.1, alpha frac > 0.8,
    dup-line frac < 0.3).

    Every ratio is ONE division of exact integer counts (the same
    portability rule as the unigram/bigram scorers); the rule
    thresholds compare those bit-identical doubles, so pass/fail
    replays exactly cross-engine.
    """
    toks = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"),
        lambda x: F.length(x) > 0,
    )
    lines = F.filter(
        F.split(F.col(text_col), r"\n"),
        lambda x: F.length(F.trim(x)) > 0,
    )
    n_words = F.size(F.col("tk")).cast("bigint")
    word_chars = F.aggregate(
        F.transform(F.col("tk"), lambda t: F.length(t).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda a, v: a + v,
    )
    n_sym = (
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"#|\.\.\."), F.lit(0)))
    ).cast("bigint")
    n_alpha_words = F.size(
        F.filter(F.col("tk"), lambda t: t.rlike("[A-Za-z]"))
    ).cast("bigint")
    n_lines = F.size(F.col("ln")).cast("bigint")
    n_distinct_lines = F.size(F.array_distinct(F.col("ln"))).cast("bigint")

    base = docs.select(
        F.col(id_col), toks.alias("tk"), lines.alias("ln"), n_sym.alias("n_sym")
    ).select(
        id_col,
        n_words.alias("n_words"),
        word_chars.alias("word_chars"),
        "n_sym",
        n_alpha_words.alias("n_alpha_words"),
        n_lines.alias("n_lines"),
        n_distinct_lines.alias("n_distinct_lines"),
    )
    mean_word_len = F.when(
        F.col("n_words") > 0,
        F.col("word_chars").cast("double") / F.col("n_words").cast("double"),
    ).otherwise(F.lit(0.0))
    symbol_ratio = F.when(
        F.col("n_words") > 0,
        F.col("n_sym").cast("double") / F.col("n_words").cast("double"),
    ).otherwise(F.lit(0.0))
    alpha_frac = F.when(
        F.col("n_words") > 0,
        F.col("n_alpha_words").cast("double") / F.col("n_words").cast("double"),
    ).otherwise(F.lit(0.0))
    dup_line_frac = F.when(
        F.col("n_lines") > 0,
        (F.col("n_lines") - F.col("n_distinct_lines")).cast("double")
        / F.col("n_lines").cast("double"),
    ).otherwise(F.lit(0.0))
    out = base.select(
        id_col,
        "n_words",
        mean_word_len.alias("mean_word_len"),
        symbol_ratio.alias("symbol_word_ratio"),
        alpha_frac.alias("alpha_word_frac"),
        dup_line_frac.alias("dup_line_frac"),
    )
    passes = (
        (F.col("n_words") >= 50)
        & (F.col("n_words") <= 100_000)
        & (F.col("mean_word_len") >= 3.0)
        & (F.col("mean_word_len") <= 10.0)
        & (F.col("symbol_word_ratio") < 0.1)
        & (F.col("alpha_word_frac") > 0.8)
        & (F.col("dup_line_frac") < 0.3)
    )
    return out.withColumn("passes", passes)


def with_char_diversity(
    df, text_col: str = "text", id_col: str = "doc_id"
):
    """(id, n_chars, n_distinct, ic_num, coincidence) per document of
    length > 1 — Friedman's index of coincidence over the character
    distribution, the classic gibberish / padding-run / binary-blob
    quality signal::

        IC = Σ c·(c−1) / (n·(n−1))   (c = per-symbol count)

    IC is 1.0 for a single repeated symbol and ≈ Σ(c/n)² ≈ 1/alphabet
    for diverse text — it is exp(−Rényi-2 entropy) up to the
    finite-sample correction, so thresholding IC is the same filter as
    thresholding collision entropy, but in the repo's integer-exact
    discipline: every aggregate is a BIGINT and the score is ONE final
    double division. Shannon entropy was deliberately rejected — it
    sums per-symbol libm ``ln`` terms whose last-ulp behavior differs
    between JVM and C across engines (measured: 32/552 rows diverged
    at 1 ulp), the exact failure mode the unigram-LM score's docstring
    documents. ``ic_num = Σ c·(c−1)`` is exposed so callers can build
    INTEGER-exact flags (e.g. ``2·ic_num > n·(n−1)`` for IC > 0.5)
    with zero float comparisons.

    The histogram is an explode + two map-side-combinable keyed
    shuffles ((id, char) counts, then per-id aggregates). A zero-
    shuffle per-row higher-order-function formulation was tried first
    and LOST by 13× (43.3s vs 3.3s on the sf0.1 corpus): Catalyst's
    projection collapse substitutes the char-array expression into the
    per-distinct-symbol filter lambda, making the build O(distinct ·
    len) substr calls per row — the same expression-duplication trap
    with_shingles documents. The exploded rows are (docs · avg_len),
    linear, and combine before shuffling.
    """
    base = df.select(
        F.col(id_col),
        F.col(text_col).alias("_t"),
        F.length(text_col).cast("bigint").alias("_n"),
    ).filter(F.col("_n") > 1)
    chars = base.select(
        F.col(id_col),
        F.explode(
            F.expr("transform(sequence(1, cast(_n as int)), i -> substr(_t, i, 1))")
        ).alias("_ch"),
    )
    per = chars.groupBy(id_col, "_ch").agg(F.count(F.lit(1)).alias("_c"))
    return (
        per.groupBy(id_col)
        .agg(
            F.sum("_c").alias("n_chars"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.sum(F.expr("_c * (_c - 1)")).alias("ic_num"),
        )
        .select(
            F.col(id_col),
            "n_chars",
            "n_distinct",
            "ic_num",
            (
                F.col("ic_num").cast("double")
                / (F.col("n_chars") * (F.col("n_chars") - 1)).cast("double")
            ).alias("coincidence"),
        )
    )
