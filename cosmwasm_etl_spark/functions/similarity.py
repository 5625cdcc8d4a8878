"""Similarity search over embedding columns (array<float>).

- :func:`cosine_topk` — brute-force exact top-k: broadcast the (small) query
  set, JVM-side dot products via ``zip_with``/``aggregate``, ``max_by``-based
  top-k per query (no global sort). The exactness baseline.
- :func:`lsh_bucketed_topk` — random-hyperplane LSH: deterministic seeded
  hyperplanes → sign-bit bucket key → candidates restricted to (multi-probe)
  matching buckets → exact re-rank. The 100 TB path: the corpus shuffles once
  on bucket id; each query probes a handful of buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


from pyspark.sql import Window


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _dot_unrolled(a, b, dim: int):
    """Left-associated unrolled dot product for a KNOWN dimension.

    Bit-identical to the ``_dot`` fold (same addition order; 0.0+x == x).
    MEASURED SLOWER than the fold on the 12.5M-pair near-dup join (64 s
    vs 25 s at 5k×5k): the 191-node Add/Multiply/GetArrayItem tree blows
    past codegen's expression budget and evaluates interpreted per node,
    while the fold loops over primitive arrays. Kept for documentation —
    do not assume "unrolled beats HOF" without measuring.
    """
    out = a[0] * b[0]
    for i in range(1, dim):
        out = out + a[i] * b[i]
    return out


def _norm_unrolled(a, dim: int):
    return F.sqrt(_dot_unrolled(a, a, dim))


def _topk_per_query(scored: DataFrame, k: int) -> DataFrame:
    """Bounded top-k per query_id from (query_id, neighbor_id, cosine) rows.

    Window ``row_number`` over (cosine DESC, neighbor_id DESC): the per-query
    candidate set is SORT-spilled by the window exchange, never buffered in a
    single aggregation array — with a corpus-sized candidate list per query a
    ``collect_list`` buffer would be an executor OOM at scale, a sort is
    disk-bounded. (Two-phase refinement if the per-query sort itself became
    the bottleneck: pre-prune per input partition, then this window.)"""
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").desc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def with_cosine(df: DataFrame, a: str, b: str, out: str = "cosine") -> DataFrame:
    c = _dot(F.col(a), F.col(b)) / (_norm(F.col(a)) * _norm(F.col(b)))
    return df.withColumn(out, F.round(c, 6))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query: (query_id, neighbor_id, cosine, rank).

    Self-matches (same id) are excluded. Queries are broadcast — the corpus
    is scanned once, never shuffled; per-query top-k is a max_by-style
    aggregation over a (query_id)-keyed exchange of corpus-size·|Q| rows —
    viable when |Q| is bounded (the ANN serving shape).
    """
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"),
            _norm(F.col(vec_col)).alias("__qn"),
        )
    )
    # norms once per row, not once per (corpus × query) pair — same
    # doubles, |Q|× fewer norm folds (see cosine_near_dups)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"),
        _norm(F.col(vec_col)).alias("__cn"),
    )
    scored = (
        c.crossJoin(q)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(_dot(F.col("__cv"), F.col("__qv")) / (F.col("__cn") * F.col("__qn")), 6),
        )
        .select("query_id", "neighbor_id", "cosine")
    )
    return _topk_per_query(scored, k)


def cosine_near_dups(
    corpus: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs (id_a < id_b, cosine ≥
    threshold). All-pairs via broadcast self-join — the exactness/oracle
    baseline for bounded corpora; use :func:`cosine_near_dups_lsh` at scale.

    Norms are computed ONCE PER ROW in the projections feeding the join,
    not per pair — inside the pair expression they would be re-evaluated
    n² times (measured 73 s → 25 s at 5k vectors, a 2.9× win for free).
    Bit-identical to the per-pair form: the same per-row doubles flow
    into the same division. ``dim`` switches the pair dot to the unrolled
    form — measured SLOWER (see ``_dot_unrolled``); default fold is the
    fast path.
    """
    nrm = (lambda c: _norm_unrolled(c, dim)) if dim else _norm
    dot = (lambda x, y: _dot_unrolled(x, y, dim)) if dim else _dot
    a = corpus.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"),
        nrm(F.col(vec_col)).alias("__na"),
    )
    b = corpus.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"),
        nrm(F.col(vec_col)).alias("__nb"),
    )
    return (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine",
            F.round(dot(F.col("__va"), F.col("__vb")) / (F.col("__na") * F.col("__nb")), 6),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def cosine_near_dups_lsh(
    corpus: DataFrame,
    threshold: float,
    dim: int,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    multiprobe: bool = True,
) -> DataFrame:
    """Embedding-cosine near-dup pairs, LSH-bucketed (the 100 TB path).

    Candidates = pairs sharing a random-hyperplane bucket (plus, with
    ``multiprobe``, buckets at Hamming distance 1 — one side only, so a
    pair is probed, never double-bucketed N²-style); exact cosine verify on
    candidates only. High-cosine pairs collide with probability
    (1 - θ/π)^n_planes, so recall at threshold≥0.9 stays high while the
    candidate set shrinks ~2^n_planes-fold. Recall vs the exact baseline is
    pinned in tests/test_training_ops.py."""
    keyed = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("__v"),
        # norm once per corpus row, carried through the bucket join —
        # never re-folded per candidate pair (see cosine_near_dups)
        _norm(F.col(vec_col)).alias("__n"),
        lsh_bucket_key(F.col(vec_col), dim, n_planes, seed).alias("bucket0"),
    )
    left = keyed.select("id", "__v", "__n", F.col("bucket0").alias("bucket"))
    if multiprobe:
        probes = F.array(
            F.col("bucket0"),
            *[F.col("bucket0").bitwiseXOR(F.lit(1 << p)) for p in range(n_planes)],
        )
        right = keyed.select("id", "__v", "__n", F.explode(probes).alias("bucket"))
    else:
        right = left
    cand = (
        left.alias("a")
        .join(right.alias("b"), ["bucket"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"), F.col("a.__v").alias("__va"),
            F.col("a.__n").alias("__na"),
            F.col("b.id").alias("id_b"), F.col("b.__v").alias("__vb"),
            F.col("b.__n").alias("__nb"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "cosine",
            F.round(_dot(F.col("__va"), F.col("__vb")) / (F.col("__na") * F.col("__nb")), 6),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit-ish hyperplanes (splitmix-style LCG,
    no numpy state): plane[p][d] in [-1, 1)."""
    planes = []
    state = seed * 0x9E3779B97F4A7C15 & (1 << 64) - 1
    for _p in range(n_planes):
        row = []
        for _d in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) & ((1 << 64) - 1)
            row.append(((state >> 11) / float(1 << 53)) * 2.0 - 1.0)
        planes.append(row)
    return planes


def lsh_bucket_key(vec_col, dim: int, n_planes: int = 8, seed: int = 42):
    """Sign-bit bucket id (0..2^n_planes-1) from seeded hyperplanes, as a
    pure Column expression."""
    planes = _hyperplanes(dim, n_planes, seed)
    key = F.lit(0)
    for p, plane in enumerate(planes):
        proj = _dot(vec_col, F.array(*[F.lit(float(x)) for x in plane]))
        key = key + F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return key


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate top-k: candidates share (one of) the query's LSH buckets,
    exact re-rank inside. ``multiprobe=True`` also probes the n_planes
    buckets at Hamming distance 1 from the query's bucket (standard
    multi-probe LSH) — recall rises steeply for ~n_planes× candidate cost,
    and only the (broadcast) query side is replicated, never the corpus."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        lsh_bucket_key(F.col(vec_col), dim, n_planes, seed).alias("bucket"),
    )
    qbase = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        lsh_bucket_key(F.col(vec_col), dim, n_planes, seed).alias("bucket0"),
    )
    if multiprobe:
        probes = F.array(
            F.col("bucket0"),
            *[F.col("bucket0").bitwiseXOR(F.lit(1 << p)) for p in range(n_planes)],
        )
        q = qbase.select(
            "query_id", "__qv", F.explode(probes).alias("bucket")
        )
    else:
        q = qbase.withColumnRenamed("bucket0", "bucket")
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(_dot(F.col("__cv"), F.col("__qv")) / (_norm(F.col("__cv")) * _norm(F.col("__qv"))), 6),
        )
        .select("query_id", "neighbor_id", "cosine")
        .distinct()  # multiprobe can surface a pair via several buckets
    )
    return _topk_per_query(scored, k)


# ---------------------------------------------------------------------
# IVF (inverted-file) ANN: train-small, search-big
# ---------------------------------------------------------------------
#
# The production IVF shape at 100 TB: centroids are trained on a BOUNDED
# deterministic sample on the driver (training is O(sample·cells·iters),
# never distributed), broadcast as literals, and the expensive parts —
# cell assignment and probed search — are single-pass column expressions
# over the corpus. Assigning the corpus to cells once and bucketing the
# table by cell_id turns every query into a pruned scan of n_probe cells
# (~n_probe/n_cells of the data), the same data layout contract as the
# event log's seq range-partitioning.
#
# Every arithmetic step below is SPECIFIED (sequential fold in index
# order, first-max-wins argmax, unit centroids, 6-dp rounding only at the
# final cosine) so the independent pure-Python oracle
# (functions/pyoracle.py ivf_topk_py) reproduces it bit-for-bit — the
# golden-fixture verification pattern of the reference's hash-dependent
# mappers (parser/dex/dezswap/mappers_test.go:16).


def train_ivf_centroids(
    corpus: DataFrame,
    dim: int,
    n_cells: int = 16,
    sample_cap: int = 1024,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Deterministic spherical k-means on a strided sample (driver-side).

    Sample = rows with ``id % stride == 0`` (stride sized so ≤ sample_cap
    rows come back), ordered by id. Init = first n_cells sample vectors.
    Each Lloyd iteration: assign by first-max-wins argmax of dot(v, c)
    (centroids are unit vectors, so argmax dot == argmax cosine), recompute
    each centroid as the normalized sequential mean of its members (empty
    cell keeps its previous centroid). All sums fold in index order —
    no pairwise/vectorized reductions — so any IEEE-double implementation
    of this spec produces identical bits."""
    n_total = corpus.count()
    stride = max(1, n_total // sample_cap)
    sample = [
        (r[0], [float(x) for x in r[1]])
        for r in corpus.select(id_col, vec_col)
        .where(F.pmod(F.col(id_col), F.lit(stride)) == 0)
        .orderBy(id_col)
        .collect()
    ]
    if len(sample) < n_cells:
        raise ValueError(f"sample ({len(sample)}) smaller than n_cells ({n_cells})")

    def _unit(v: list[float]) -> list[float]:
        s = 0.0
        for x in v:
            s += x * x
        n = s ** 0.5
        return [x / n for x in v] if n > 0 else list(v)

    cents = [_unit(v) for _, v in sample[:n_cells]]
    for _ in range(iters):
        sums = [[0.0] * dim for _ in range(n_cells)]
        counts = [0] * n_cells
        for _, v in sample:
            best, best_s = 0, None
            for ci, c in enumerate(cents):
                s = 0.0
                for a, b in zip(v, c):
                    s += a * b
                if best_s is None or s > best_s:  # first-max-wins
                    best, best_s = ci, s
            counts[best] += 1
            row = sums[best]
            for d in range(dim):
                row[d] += v[d]
        cents = [
            _unit([sums[ci][d] / counts[ci] for d in range(dim)]) if counts[ci] else cents[ci]
            for ci in range(n_cells)
        ]
    return cents


def _cell_scores(vec_name: str, centroids: list[list[float]]):
    """array<double> of dot(v, c_i), one per centroid, as a Column.

    The centroid matrix is ONE nested array literal (constant-folded by
    Catalyst) and the dot product ONE transform lambda over it — not
    n_cells copies of the fold expression: with 16x64 literals inlined per
    copy, planning/codegen of the duplicated tree costs seconds per query
    regardless of data size. Built as ONE SQL string: the nested-F.lit
    Column form costs n_cells x dim py4j round trips (~1 s of driver-side
    build time for 16x64) before Spark ever sees the plan. Double literals
    use repr() (shortest round-trip) + 'D', which parses to the identical
    IEEE value F.lit produced. ``vec_name`` is the attribute NAME of the
    vector column (cheap to re-read inside the lambda)."""
    cents = "array(" + ", ".join(
        "array(" + ", ".join(f"{float(x)!r}D" for x in c) + ")" for c in centroids
    ) + ")"
    return F.expr(
        f"transform({cents}, c -> aggregate(zip_with({vec_name}, c, (x, y) -> x * y),"
        " 0.0D, (acc, v) -> acc + v))"
    )


def ivf_cell(scores_col):
    """First-max-wins argmax cell id (0-based) from a MATERIALIZED scores
    column (``array_position`` returns the FIRST occurrence, matching the
    training spec's argmax). Takes a column reference, not the scores
    expression: a non-lambda expression referenced from inside a
    higher-order-function lambda is RE-EVALUATED per element by Catalyst
    (the round-4 minhash 40x lesson, BENCH.md) — project the scores array
    once, then everything downstream reads the attribute."""
    return (F.array_position(scores_col, F.array_max(scores_col)) - 1).cast("int")


def _probe_cells(scores_col, n_cells: int, n_probe: int):
    """Top-``n_probe`` cell ids by (score DESC, cell_id ASC) as an
    array<int> Column — a comparator array_sort over (score, idx) structs,
    stable by construction of the explicit idx tiebreak. ``scores_col``
    must be a materialized column reference (see :func:`ivf_cell`)."""
    pairs = F.transform(
        F.sequence(F.lit(0), F.lit(n_cells - 1)),
        lambda i: F.struct(
            F.element_at(scores_col, (i + 1).cast("int")).alias("s"), i.cast("int").alias("i")
        ),
    )
    ordered = F.array_sort(
        pairs,
        lambda l, r: (
            F.when(l["s"] > r["s"], F.lit(-1))
            .when(l["s"] < r["s"], F.lit(1))
            .when(l["i"] < r["i"], F.lit(-1))
            .otherwise(F.lit(1))
        ),
    )
    return F.transform(F.slice(ordered, 1, n_probe), lambda p: p["i"])


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 5,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: each query probes its ``n_probe`` best cells;
    candidates = corpus rows assigned to those cells; exact cosine re-rank
    inside. Output (query_id, neighbor_id, cosine, rank).

    Plan shape: corpus is scanned once and tagged with its cell (a pure
    projection — at scale, materialize it and bucket by cell instead);
    queries are broadcast with their probe lists exploded, so the join is
    a broadcast-hash on cell id and the corpus never shuffles."""
    c = (
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("__cv"),
            _cell_scores(vec_col, centroids).alias("__s"),
        )
        .select("neighbor_id", "__cv", ivf_cell(F.col("__s")).alias("cell"))
    )
    q = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("__qv"),
            _cell_scores(vec_col, centroids).alias("__s"),
        )
        .select(
            "query_id",
            "__qv",
            F.explode(
                _probe_cells(F.col("__s"), len(centroids), n_probe)
            ).alias("cell"),
        )
    )
    scored = (
        c.join(F.broadcast(q), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("__cv"), F.col("__qv"))
                / (_norm(F.col("__cv")) * _norm(F.col("__qv"))),
                6,
            ),
        )
        .select("query_id", "neighbor_id", "cosine")
    )
    return _topk_per_query(scored, k)


def cosine_near_dups_blocked(
    corpus: DataFrame,
    threshold: float,
    n_blocks: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact all-pairs cosine near-dups via BLOCKED GEMM — the fast exact
    engine (same output contract as :func:`cosine_near_dups`).

    The n² pair work is irreducible for an exact result; what is NOT
    irreducible is evaluating it as 12.5M interpreted per-pair expression
    folds. This operator tiles the corpus into ``n_blocks`` hash blocks,
    routes every unordered block pair (i ≤ j) to one ``applyInPandas``
    group, and computes each tile as ONE numpy float64 matmul (A @ B.T) —
    vectorized C per tile instead of an expression interpreter per pair.
    Measured 31.6 s → ~2 s on 5k×64 vs the column-expression baseline.

    Scale shape: each row is replicated to the n_blocks block pairs it
    participates in (the classic triangle-join cost — all-pairs reads
    each side O(√P) times no matter the engine); one exchange on the
    block-pair key; tiles are independent, so parallelism = b(b+1)/2 and
    per-task memory is bounded by two blocks of vectors. Pick n_blocks so
    a block fits an Arrow batch (~n/b vectors). For unbounded corpora use
    :func:`cosine_near_dups_lsh` — blocked GEMM is the exact engine for
    bounded (≤ millions) embedding sets.

    Parity: cosines are float64 ``dot/(||a||·||b||)`` rounded to 6
    decimals, like the column path; numpy's summation order may differ
    from a sequential fold by ~1 ulp, which round-to-6 absorbs except on
    exact rounding boundaries — equality with the column path and the
    DuckDB oracle is pinned in tests on the fixture corpus.
    """
    import numpy as np
    import pandas as pd

    if n_blocks < 1:
        raise ValueError(f"n_blocks must be >= 1, got {n_blocks}")
    blk = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks))
    # each row joins every block pair (i, j), i <= j, where its block is
    # i or j: exactly n_blocks entries per row
    keyed = corpus.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), blk.alias("k")
    )
    pair_entries = F.transform(
        F.sequence(F.lit(0), F.lit(n_blocks - 1)),
        lambda o: F.struct(
            F.least(F.col("k"), o).alias("pi"), F.greatest(F.col("k"), o).alias("pj")
        ),
    )
    exploded = keyed.select(
        "id", "v", "k", F.explode(pair_entries).alias("p")
    ).select("id", "v", "k", F.col("p.pi").alias("pi"), F.col("p.pj").alias("pj"))

    out_schema = "id_a long, id_b long, cosine double"

    def _tile(pdf: pd.DataFrame) -> pd.DataFrame:
        pi, pj = int(pdf["pi"].iloc[0]), int(pdf["pj"].iloc[0])
        ids = pdf["id"].to_numpy()
        X = np.stack(pdf["v"].to_numpy()).astype(np.float64)
        norms = np.sqrt((X * X).sum(axis=1))
        if pi == pj:
            # each row reaches its own (k,k) tile exactly once (only the
            # o==k entry maps there); the unique() is defensive against
            # duplicate ids in the input
            _, first = np.unique(ids, return_index=True)
            ids, X, norms = ids[first], X[first], norms[first]
            a_ids = b_ids = ids
            A = B = X
            na = nb = norms
        else:
            am = (pdf["k"].to_numpy() == pi)
            a_ids, b_ids = ids[am], ids[~am]
            A, B = X[am], X[~am]
            na, nb = norms[am], norms[~am]
        if len(a_ids) == 0 or len(b_ids) == 0:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []}).astype(
                {"id_a": "int64", "id_b": "int64", "cosine": "float64"}
            )
        cos = np.round((A @ B.T) / np.outer(na, nb), 6)
        ia, ib = np.nonzero(cos >= threshold)
        id_a, id_b = a_ids[ia], b_ids[ib]
        keep = id_a != id_b
        lo = np.minimum(id_a[keep], id_b[keep])
        hi = np.maximum(id_a[keep], id_b[keep])
        c = cos[ia, ib][keep]
        df = pd.DataFrame({"id_a": lo, "id_b": hi, "cosine": c})
        # within-block tiles see each unordered pair twice (full square)
        return df.drop_duplicates(["id_a", "id_b"]) if pi == pj else df

    return exploded.groupBy("pi", "pj").applyInPandas(_tile, schema=out_schema)
