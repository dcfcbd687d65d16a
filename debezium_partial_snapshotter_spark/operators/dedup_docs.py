"""Document deduplication for training-data pipelines.

Five dedup families (exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine), all expressed as shuffles Catalyst can optimize —
explode → groupBy with partial aggregation, broadcast-able dims, and
candidate-pair generation via equi-joins on LSH buckets (never an O(n²)
cross join).

Hash functions are md5-based so plain-SQL oracles (DuckDB) compute the
IDENTICAL buckets/signatures — portability is part of the design, not a
test convenience.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WORD_SPLIT = r"\s+"


def _words(col):
    return F.split(F.trim(F.lower(col)), WORD_SPLIT)


def dedup_exact(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup by content hash: canonical = min(doc_id) per hash.
    One hash-groupBy shuffle; the canonical-id broadcast join back is a
    map-side join at scale."""
    h = F.md5(F.col(text_col))
    hashed = df.select(F.col("doc_id"), h.alias("h"))
    canon = hashed.groupBy("h").agg(
        F.min("doc_id").alias("canonical_id"),
        F.count(F.lit(1)).alias("group_size"),
    )
    return (
        hashed.join(canon, "h")
        .select(
            "doc_id",
            "canonical_id",
            "group_size",
            (F.col("doc_id") != F.col("canonical_id")).alias("is_dup"),
        )
    )


def _shingle_arr(text_col: str, n: int):
    """Word n-gram shingle SET as an array column.

    Built by zip_with over n shifted slices of the word array — the
    regex split evaluates O(n) times per row, not O(n·shingles) as an
    element_at-per-index transform would (codegen does not eliminate
    common subexpressions inside higher-order-function lambdas).
    Documents with fewer than n words produce an empty set."""
    w = _words(F.col(text_col))
    acc = w
    for j in range(1, n):
        shifted = F.slice(w, j + 1, F.greatest(F.size(w) - j, F.lit(0)))
        acc = F.zip_with(
            acc,
            shifted,
            lambda x, y: F.when(
                x.isNull() | y.isNull(), F.lit(None)
            ).otherwise(F.concat(x, F.lit(" "), y)),
        )
    return F.array_distinct(
        F.filter(acc, lambda s: s.isNotNull() & (F.length(s) > 0))
    )


def shingles(df: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """Word n-gram shingles, exploded: (doc_id, shingle) distinct."""
    return df.select(
        "doc_id", F.explode(_shingle_arr(text_col, n)).alias("shingle")
    )


def minhash_signatures(
    df: DataFrame, text_col: str = "text", k: int = 8, shingle_n: int = 3
) -> DataFrame:
    """k-permutation MinHash: sig_s = min over shingles of
    md5(shingle || '#' || s).

    Plan: explode once (the shingle array is built exactly once per doc
    — building it inside per-seed lambdas defeats codegen subexpression
    elimination and recomputes the regex split per element), hash k ways
    per shingle row, then ONE partial-aggregating groupBy: min is
    algebraic, so the shuffle carries only k strings per doc per map
    partition regardless of document length."""
    sh = df.select(
        "doc_id", F.explode(_shingle_arr(text_col, shingle_n)).alias("shingle")
    )
    hashed = sh.select(
        "doc_id",
        *[
            F.md5(F.concat_ws("#", "shingle", F.lit(str(s)))).alias(f"h{s}")
            for s in range(k)
        ],
    )
    sig = hashed.groupBy("doc_id").agg(
        *[F.min(f"h{s}").alias(f"h{s}") for s in range(k)]
    )
    return sig.select(
        "doc_id",
        F.posexplode(F.array(*[F.col(f"h{s}") for s in range(k)])).alias(
            "seed", "mh"
        ),
    )  # (doc_id, seed, mh)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    k: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """LSH banding: band_hash = md5(concat of the band's signature rows);
    candidate pairs share any band bucket. Self-join is on the band-hash
    equi-key (bucketable at scale), never a cross join."""
    rows_per_band = k // bands
    sig = minhash_signatures(df, text_col, k, shingle_n)
    banded = (
        sig.withColumn("band", (F.col("seed") / rows_per_band).cast("int"))
        .groupBy("doc_id", "band")
        .agg(F.md5(F.concat_ws("|", F.sort_array(F.collect_list("mh")))).alias("bh"))
    )
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    return pairs


def jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    threshold: float = 0.8,
    shingle_n: int = 1,
) -> DataFrame:
    """n-gram Jaccard near-dup: candidate pairs via shared-shingle
    equi-join, |A∩B| counted in the join, |A∪B| = |A|+|B|-|A∩B|.
    Shuffles on shingle then on the pair key — both partial-aggregated."""
    sh = shingles(df, text_col, shingle_n)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
                4,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "inter", "sz_a", "sz_b", "jaccard")
    )


def simhash(df: DataFrame, text_col: str = "text", bits: int = 32) -> DataFrame:
    """SimHash: each word hashes to a ``bits``-wide value (md5 prefix);
    bit b of the fingerprint is the sign of Σ_words (±1 per word-bit).
    Expressed as explode(words × bits) → two partial-aggregating
    groupBys — linear in tokens, no UDFs."""
    words = df.select(
        "doc_id", F.explode(F.array_distinct(_words(F.col(text_col)))).alias("w")
    ).where(F.length("w") > 0)
    # word hash as a bits-wide integer (md5 first 8 hex chars)
    wh = words.withColumn(
        "wh", F.conv(F.substring(F.md5("w"), 1, 8), 16, 10).cast("long")
    )
    bit = F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit")
    # python-API shiftright/shiftleft require literal shift amounts; the
    # SQL expressions accept a column
    contrib = wh.select("doc_id", "wh", bit).withColumn(
        "c",
        F.when(F.expr("(shiftright(wh, bit) & 1) = 1"), 1).otherwise(-1),
    )
    bitsum = contrib.groupBy("doc_id", "bit").agg(F.sum("c").alias("s"))
    return bitsum.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("s") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), bit)")).otherwise(
                F.lit(0)
            )
        ).alias("simhash")
    )


def embedding_near_dup(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    planes: int = 8,
) -> DataFrame:
    """Embedding cosine near-dup: sign-LSH bucket (deterministic
    pseudo-random hyperplanes from md5 of (dim, plane)) then exact
    cosine verify within buckets. The bucket join is an equi-join —
    no cross join at any scale."""
    dim = F.size(F.col(vec_col))
    norm = F.sqrt(
        F.aggregate(
            F.col(vec_col), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x
        )
    )
    nvec = F.transform(F.col(vec_col), lambda x: x.cast("double") / norm)
    df = emb.select(F.col(id_col).alias("vid"), nvec.alias("v"))

    # plane p weight for dim i: md5-derived value in [-1, 1)
    def plane_dot(p: int):
        return F.aggregate(
            F.zip_with(
                F.col("v"),
                F.sequence(F.lit(0), F.size("v") - 1),
                lambda x, i: x
                * (
                    F.conv(
                        F.substring(
                            F.md5(F.concat_ws("_", i.cast("string"), F.lit(str(p)))),
                            1,
                            6,
                        ),
                        16,
                        10,
                    ).cast("double")
                    / F.lit(8388608.0)
                    - F.lit(1.0)
                ),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    sig = F.concat_ws(
        "", *[F.when(plane_dot(p) >= 0, "1").otherwise("0") for p in range(planes)]
    )
    bucketed = df.withColumn("sig", sig)
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    cos = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        a.join(
            b,
            (F.col("a.sig") == F.col("b.sig")) & (F.col("a.vid") < F.col("b.vid")),
        )
        .select(
            F.col("a.vid").alias("id_a"),
            F.col("b.vid").alias("id_b"),
            F.round(cos, 4).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )
