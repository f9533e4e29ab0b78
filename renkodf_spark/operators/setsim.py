"""Exact set-similarity join: prefix-filtered Jaccard threshold join.

The missing complement to the probabilistic near-dup family in
``operators/dedup.py``: MinHash-LSH trades recall for speed; the
prefix-filter join (Chaudhuri/Ganti/Kaushik SSJoin ICDE 2006, Xiao et
al. PPJoin WWW 2008, distributed form Vernica/Carey/Li SIGMOD 2010)
returns EXACTLY the pairs with Jaccard >= t — candidate filters are
sound pruning, never recall trades.

Filter soundness (all three are classical):
- prefix filter: order every doc's elements by ascending global
  document frequency (rarest first, ties by element hash). If
  J(a, b) >= t, then |a ∩ b| >= ceil(t/(1+t) * (|a|+|b|)) and the two
  prefixes of length |x| - ceil(t*|x|) + 1 must share an element —
  so the (element-keyed) self-join of prefixes alone generates every
  qualifying pair.
- length filter: J <= min(|a|,|b|) / max(|a|,|b|), so a qualifying
  pair satisfies t * max <= min.
- positional filter (PPJoin, batch form): elements are sorted by the
  SAME global order in every record, so the c shared prefix elements
  of a pair occupy consistent increasing positions in both records;
  with the LAST witness at positions (max_pa, max_pb), every other
  shared element either precedes it in both records (then it lies in
  both prefixes and is one of the c witnesses) or follows it in both
  (at most min(|a| - max_pa, |b| - max_pb) such). Hence
  overlap <= c + min(|a| - max_pa, |b| - max_pb); prune when that
  bound is below alpha = ceil(t/(1+t) * (|a|+|b|)).

All arithmetic is integer-exact: the threshold is a rational
``(t_num, t_den)`` and every comparison is cross-multiplied
(``inter * t_den >= t_num * union``), so Spark and the DuckDB oracle
agree bit-for-bit with no float-boundary risk.

Set elements are word ``shingle_n``-gram shingles hashed to 48 bits
(first 12 md5 hex chars as BIGINT — the engine-portable ``hash_split``
convention, replayed exactly by the SQL oracle). Element identity is
therefore the 48-bit digest; a collision would merge two shingles on
BOTH engines identically (probability ~ |set|^2 / 2^49 per doc).

100 TB shape: the text column is consumed by the first doc-local map
stage and never enters an exchange — every shuffle moves (id, h, ...)
long triples. Global element frequencies are one narrow groupBy; the
candidate join fans out only on PREFIX elements, which the
frequency-ascending order makes the rarest in the corpus (the whole
point of the ordering), and the verify stage touches only surviving
candidates. No driver-side collect anywhere.

Reference parity note: the reference engine (srlcarlg/renkodf,
src/renkodf/renkodf.py) has no dedup surface; this module is part of
the training-data-pipeline extension mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _validate_threshold(t_num: int, t_den: int) -> None:
    if not (isinstance(t_num, int) and isinstance(t_den, int)):
        raise ValueError(f"threshold must be an integer rational, got {t_num}/{t_den}")
    if not (0 < t_num <= t_den):
        raise ValueError(f"threshold must satisfy 0 < t_num <= t_den, got {t_num}/{t_den}")


def element_table(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """The distinct ``(id, h)`` element relation: h = 48-bit md5-prefix
    hash of each word ``shingle_n``-gram. Docs with fewer than
    ``shingle_n`` tokens yield no rows (guarded sequence — the same
    empty-safe contract as ``dedup._shingles``)."""
    if shingle_n <= 0:
        raise ValueError(f"shingle_n must be positive, got {shingle_n}")
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    idx = F.when(
        F.size(toks) >= shingle_n, F.sequence(F.lit(0), F.size(toks) - F.lit(shingle_n))
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, shingle_n)))
    return (
        df.select(F.col(id_col).alias("id"), F.explode(grams).alias("g"))
        .select(
            "id",
            F.conv(F.substring(F.md5(F.col("g")), 1, 12), 16, 10).cast("long").alias("h"),
        )
        .distinct()
    )


def _ceil_div(num, den: int):
    # exact integer ceil(num / den) for non-negative num
    return F.floor((num + F.lit(den - 1)) / F.lit(den)).cast("long")


def prefix_index(
    elements: DataFrame,
    *,
    t_num: int = 1,
    t_den: int = 2,
) -> DataFrame:
    """The prefix index over a distinct ``(id, h)`` element relation:
    one row per doc per PREFIX element — ``(id, sz, pos, h)`` where
    ``pos`` is the element's 1-based rank in ascending global document
    frequency (ties by h) and ``pos <= sz - ceil(t*sz) + 1``.

    This is the persistable half of the join (the ``band_table``
    analogue): write it once per corpus snapshot, equi-join increments
    against it.
    """
    _validate_threshold(t_num, t_den)
    szs = elements.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    freq = elements.groupBy("h").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("id").orderBy("c", "h")
    prefix_len = F.col("sz") - _ceil_div(F.lit(t_num) * F.col("sz"), t_den) + F.lit(1)
    return (
        elements.join(freq, "h")
        .join(szs, "id")
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .filter(F.col("pos") <= prefix_len)
        .select("id", "sz", "pos", "h")
    )


def setsim_join(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    t_num: int = 1,
    t_den: int = 2,
    round_digits: int = 4,
) -> DataFrame:
    """All pairs with shingle-set Jaccard >= t_num/t_den — EXACT
    (100% recall, 100% precision; the filters only prune cost).

    Output: ``(id_a, id_b, inter, sz_a, sz_b, jaccard)`` with
    id_a < id_b, jaccard rounded to ``round_digits``.
    """
    _validate_threshold(t_num, t_den)
    e = element_table(df, text_col=text_col, id_col=id_col, shingle_n=shingle_n)
    e = e.cache()  # feeds the prefix index, both candidate sides, and verify
    pref = prefix_index(e, t_num=t_num, t_den=t_den)
    a = pref.select(
        F.col("h"),
        F.col("id").alias("id_a"),
        F.col("sz").alias("sz_a"),
        F.col("pos").alias("pos_a"),
    )
    b = pref.select(
        F.col("h"),
        F.col("id").alias("id_b"),
        F.col("sz").alias("sz_b"),
        F.col("pos").alias("pos_b"),
    )
    # alpha = ceil(t/(1+t) * (sz_a + sz_b)) — the minimum overlap a
    # qualifying pair must reach; t/(1+t) = t_num / (t_num + t_den)
    alpha = _ceil_div(F.lit(t_num) * (F.col("sz_a") + F.col("sz_b")), t_num + t_den)
    cand = (
        a.join(b, "h")
        .filter(F.col("id_a") < F.col("id_b"))
        # length filter: t * max(sz) <= min(sz), cross-multiplied
        .filter(
            F.lit(t_den) * F.least("sz_a", "sz_b")
            >= F.lit(t_num) * F.greatest("sz_a", "sz_b")
        )
        .groupBy("id_a", "id_b", "sz_a", "sz_b")
        .agg(
            F.count(F.lit(1)).alias("__c"),
            F.max("pos_a").alias("__mpa"),
            F.max("pos_b").alias("__mpb"),
        )
        # positional filter (see module docstring): overlap is bounded
        # by witnesses-so-far + what can still follow the last witness
        .filter(
            F.col("__c")
            + F.least(
                F.col("sz_a") - F.col("__mpa"), F.col("sz_b") - F.col("__mpb")
            )
            >= alpha
        )
        .drop("__c", "__mpa", "__mpb")
    )
    sets = e.groupBy("id").agg(F.sort_array(F.collect_set("h")).alias("hs"))
    inter = F.size(F.array_intersect("hs_a", "hs_b")).cast("long")
    uni = F.col("sz_a") + F.col("sz_b") - F.col("inter")
    return (
        cand.join(
            sets.select(F.col("id").alias("id_a"), F.col("hs").alias("hs_a")), "id_a"
        )
        .join(sets.select(F.col("id").alias("id_b"), F.col("hs").alias("hs_b")), "id_b")
        .withColumn("inter", inter)
        .drop("hs_a", "hs_b")
        # the exact threshold: inter / union >= t, cross-multiplied
        .filter(F.col("inter") * F.lit(t_den) >= F.lit(t_num) * uni)
        .select(
            "id_a",
            "id_b",
            "inter",
            "sz_a",
            "sz_b",
            F.round(F.try_divide(F.col("inter"), uni), round_digits).alias("jaccard"),
        )
    )
