"""Fuzzy (approximate-string) join via q-gram prefilter + edit-distance
verify — the classic similarity-join decomposition (Gravano et al.
2001, "Approximate String Joins in a Database (Almost) for Free").

A naive fuzzy join is levenshtein() over the cross product — O(n²)
distance computations, each O(len²). The scalable shape is the same
candidates→verify split as MinHash-LSH dedup (operators/dedup.py):

1. DEDUPLICATE the join keys first — distance is a function of the
   string, so each distinct string is processed once no matter how
   many rows carry it (at 100 TB the distinct-key table is orders of
   magnitude smaller than the fact table).
2. CANDIDATES by shared q-grams: explode each distinct string into its
   distinct q-grams, self-equi-join on the gram (a hash shuffle keyed
   by gram — never a cross product), count shared grams, keep pairs
   with >= ``min_shared``. Count filtering is sound: two strings
   within edit distance d share >= max(len)-q+1 - d*q grams, so with
   the right threshold no true pair is lost.
3. VERIFY survivors with the exact levenshtein() — now over the small
   candidate set only.

Skew note: a stop-gram (a q-gram occurring in a large fraction of
keys) is the posting-list problem again; cap df on the gram exactly as
``sparse_tf_cosine_pairs`` caps terms when vocabularies degenerate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def qgram_levenshtein_join(
    df: DataFrame,
    text_col: str,
    q: int = 3,
    min_shared: int = 2,
    max_dist: int = 3,
    max_gram_freq: int | None = None,
) -> DataFrame:
    """Self fuzzy-join of the DISTINCT values of ``text_col``.

    Returns (name_a, name_b, n_shared, lev) with name_a < name_b,
    n_shared = number of distinct shared q-grams (>= ``min_shared``)
    and lev = exact edit distance (<= ``max_dist``). Deterministic —
    both engines implement plain Levenshtein, so the verify predicate
    is bit-portable.

    ``max_gram_freq`` is the stop-gram cap (r8 verdict item 5,
    mirroring ``dedup.py``'s stop-shingle cap): a q-gram carried by
    more than N distinct names (``"the"``, ``"ing"`` on a 100M-name
    entity table) is dropped from the blocking index BEFORE the
    self-join, because its posting list alone contributes C(df, 2)
    candidate rows — the one term that breaks the candidates→verify
    decomposition at scale. RECALL CONTRACT (same as the shingle
    family's): ``n_shared`` then counts only non-hot shared grams, so
    a pair whose shared grams are all (or mostly) stop-grams falls
    below ``min_shared`` and is unfindable — exactly the pairs whose
    evidence is the least distinctive. The default is ``None`` (exact
    — required wherever the result is compared against an exact
    oracle); scale-sensitive call sites opt into a cap explicitly,
    mirroring how ``ngram_jaccard_pairs`` callers pass
    ``max_shingle_freq`` (r9 ADVICE: a capped default silently
    changes recall for callers that do not opt out). The probed
    feasibility boundary: uncapped 2,000 names = 887s vs capped
    50,000 names = 452s (PLANS.md, r9) — at entity-table scale the
    cap is mandatory, so pass ~10_000 there.
    """
    names = df.select(F.col(text_col).alias("name")).distinct().filter(
        F.length("name") >= q
    )
    gram = F.explode(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.length("name") - (q - 1)),
                lambda i: F.col("name").substr(i, F.lit(q)),
            )
        )
    )
    grams = names.select("name", gram.alias("g"))
    if max_gram_freq is not None:
        # stop-gram set is tiny (only over-cap grams) → broadcast
        # anti-join, computed lazily inside the main job.
        hot = (
            grams.groupBy("g")
            .count()
            .filter(F.col("count") > max_gram_freq)
            .select("g")
        )
        grams = grams.join(F.broadcast(hot), "g", "left_anti")
    a = grams.select(F.col("name").alias("name_a"), "g")
    b = grams.select(F.col("name").alias("name_b"), "g")
    cand = (
        a.join(b, "g")
        .filter(F.col("name_a") < F.col("name_b"))
        .groupBy("name_a", "name_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    return cand.select(
        "name_a",
        "name_b",
        "n_shared",
        F.levenshtein("name_a", "name_b").cast("bigint").alias("lev"),
    ).filter(F.col("lev") <= max_dist)
