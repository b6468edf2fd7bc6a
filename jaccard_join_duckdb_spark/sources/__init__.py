"""Sources: readers and input-shaping helpers.

Mirrors the reference's ingestion surface (SURVEY.md §2.1):
CSV auto-schema scan (S1, reference ``notebook.ipynb`` cell 9),
JSON-lines ingest (S2, cell 30/33 — the reference hops through
pandas; Spark reads JSONL natively), parquet, and the canonical
``(id, val)`` projection used as join input (P1/P2, cell 9's
``SELECT id, concat(...) as val``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "read_csv",
    "load_table",
    "read_jsonl",
    "read_parquet",
    "read_orc",
    "write_orc",
    "concat_val",
    "to_join_input",
    "register_view",
    "union_distinct",
    "sample_fixed",
    "hash_split",
    "mix_corpora",
    "mix_corpora_by_budget",
    "stratified_sample",
    "deterministic_shuffle",
    "write_training_shards",
    "write_bucketed",
    "read_table",
    "read_binary_assets",
]


def read_csv(spark: SparkSession, path: str) -> DataFrame:
    """CSV with header + type inference — parity with DuckDB's
    auto-detecting ``FROM 'x.csv'`` scan (S1)."""
    return spark.read.option("header", True).option("inferSchema", True).csv(path)


def read_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """JSON-lines. The reference routes through ``pd.read_json(...,
    lines=True)`` + a pandas replacement scan (S2); Spark's native
    JSONL reader is distributed and schema-inferring."""
    return spark.read.json(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC (beyond the reference's CSV/JSONL surface): columnar format
    with predicate pushdown + column pruning, same as parquet —
    relevant for lakes standardized on ORC."""
    return spark.read.orc(path)


def read_binary_assets(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    max_bytes: int | None = None,
) -> DataFrame:
    """Raw-file ingestion for the multimodal pipeline: Spark's
    built-in ``binaryFile`` source reads a directory tree of image /
    audio / arbitrary blobs into ``(path, modificationTime, length,
    content)`` — the on-ramp that turns a crawl dump of files into
    the opaque-payload asset table ``sources.multimodal`` decodes
    (payloads stay executor-side end to end; the driver never sees
    bytes). ``glob`` filters by filename pattern (e.g. ``*.png``);
    ``max_bytes`` guards against whale files blowing executor memory
    (``spark.sql.sources.binaryFile.maxLength`` hard-errors instead
    of skipping, so the predicate filter here is the skip-don't-die
    path — it is pushed down to the file listing, not applied after
    a doomed read).

    Output: ``(asset_id, asset_len, payload)`` — ``asset_id`` is the
    file path, matching the multimodal asset schema.
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    if max_bytes is not None:
        df = df.filter(F.col("length") <= int(max_bytes))
    return df.select(
        F.col("path").alias("asset_id"),
        F.col("length").cast("long").alias("asset_len"),
        F.col("content").alias("payload"),
    )


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one of the testdata tables (``TESTDATA.md``) from
    ``{sf_dir}/{name}.parquet``, normalizing physical-type quirks:
    the ``events`` table stores TIMESTAMP(NANOS), which Spark's
    parquet reader rejects — read nanos as long and truncate to
    microseconds (exactly what DuckDB's TIMESTAMP cast does, so
    oracle comparisons stay bit-identical)."""
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(path)


def concat_val(*cols: str, sep: str = " ") -> F.Column:
    """DuckDB-``concat`` parity: NULL inputs contribute an empty
    string (DuckDB concat skips NULLs; Spark ``F.concat`` would
    null the whole row — SURVEY.md §2.2 P2 hazard). The reference
    interleaves literal separators: ``concat(c1, ' ', c2, ...)``,
    so a NULL column yields doubled separators; we reproduce that.
    """
    parts: list[F.Column] = []
    for i, c in enumerate(cols):
        if i:
            parts.append(F.lit(sep))
        parts.append(F.coalesce(F.col(c).cast("string"), F.lit("")))
    return F.concat(*parts)


def to_join_input(df: DataFrame, key: str, *val_cols: str) -> DataFrame:
    """Project to the canonical join-input shape ``(id, val)``
    (FIXTURES.md §6)."""
    return df.select(F.col(key).alias("id"), concat_val(*val_cols).alias("val"))


def union_distinct(*dfs: DataFrame) -> DataFrame:
    """SQL ``UNION`` (distinct) across inputs — the reference builds
    ``srcall`` as ``src1 UNION src2 UNION src3`` (notebook.ipynb cell
    12). Spark's ``union`` is UNION ALL, so the ``distinct`` is
    mandatory for parity (SURVEY.md §4.3.3)."""
    if not dfs:
        raise ValueError("union_distinct needs at least one DataFrame")
    out = dfs[0]
    for df in dfs[1:]:
        out = out.union(df)
    return out.distinct()


def sample_fixed(df: DataFrame, n: int, seed: int = 42) -> DataFrame:
    """Fixed-size sample — the reference uses DuckDB's reservoir
    ``USING SAMPLE 5000`` (notebook.ipynb cell 37), which is
    non-deterministic; this is the reproducible Spark equivalent
    (seeded random order, then limit)."""
    return df.orderBy(F.rand(seed)).limit(int(n))


def _stable_u(id_col, salt):
    """``u(id) = uint32(md5(id ':' salt)[:8 hex]) / 2^32`` — the
    engine-portable per-row uniform shared by :func:`hash_split`,
    :func:`mix_corpora`, :func:`stratified_sample`, and
    :func:`deterministic_shuffle`. ``salt`` is a string or a Column
    (per-row salts: stratum values). Exact in double (integer < 2^32
    / 2^32), so DuckDB reproduces it bit-for-bit; NULL ids (or NULL
    column salts) propagate to NULL u (every comparison false)."""
    salt_col = F.lit(salt) if isinstance(salt, str) else salt.cast("string")
    return (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(id_col.cast("string"), F.lit(":"), salt_col)
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        .cast("double")
        / F.lit(4294967296.0)
    )


def mix_corpora(
    sources: list[tuple[DataFrame, float]],
    id_col: str,
    seed: int = 42,
    source_col: str = "source",
) -> DataFrame:
    """Weighted corpus mixing — the data-mixing step that pairs with
    :func:`hash_split`: each source DataFrame is deterministically
    downsampled at its rate (keep row iff
    ``u(id ':' seed ':' source_index) < rate``) and the survivors are
    unioned with a ``source_col`` index column. Rates are
    per-source KEEP PROBABILITIES in (0, 1] (a Pile/Dolma-style
    mixture re-weights corpora by sampling, e.g. books at 1.0, crawl
    at 0.3), not split proportions.

    The sample is a pure function of (row id, seed, source index) —
    stable across runs, engines, repartitions, and corpus growth, and
    INDEPENDENT across sources (the source index salts the hash, so a
    row id shared by two sources draws twice). NULL ids hash to NULL
    and are dropped from every source — same in the DuckDB oracle
    (NULL < rate is NULL). Scan-shaped (filter + union), no shuffle;
    100 TB-safe by construction.

    For a TOKEN-budget mixture, convert each budget to a rate first
    (``rate = min(1, budget_tokens / source_tokens)`` via
    :func:`..functions.text.corpus_profile`'s ``total_tokens``) —
    uniform row sampling preserves expected token shares without a
    corpus-wide sort, which is the scalable way to hit a budget.
    """
    if not sources:
        raise ValueError("mix_corpora needs at least one (df, rate)")
    out = None
    for idx, (df, rate) in enumerate(sources):
        if not (0.0 < float(rate) <= 1.0):
            raise ValueError(
                f"mix_corpora rate for source {idx} must be in (0, 1], "
                f"got {rate}"
            )
        u = _stable_u(F.col(id_col), f"{int(seed)}:{idx}")
        part = (
            df.filter(u < F.lit(float(rate)))
            .withColumn(source_col, F.lit(idx).cast("int"))
        )
        out = part if out is None else out.union(part)
    return out


def mix_corpora_by_budget(
    sources: list[tuple[DataFrame, int]],
    id_col: str,
    text_col: str,
    seed: int = 42,
    source_col: str = "source",
) -> DataFrame:
    """:func:`mix_corpora` with per-source TOKEN BUDGETS instead of
    rates — the form a pipeline plan states ("300B tokens of crawl,
    50B of books"). Each source's whitespace-token total is measured
    with one aggregate (a single scalar to the driver per source —
    the only driver-side values, same class as the reference's widow
    counts), the budget converts to ``rate = min(1, budget / total)``,
    and the uniform row sample preserves the expected token share
    without any corpus-wide sort or shuffle. Sources with an empty
    token total keep rate 1 (nothing to trim). The result carries the
    same determinism contract as :func:`mix_corpora`; realized tokens
    land within sampling noise of the budget (law of large numbers
    over documents), which is the accepted industry trade for a
    scan-shaped plan.
    """
    if not sources:
        raise ValueError("mix_corpora_by_budget needs at least one source")
    rated: list[tuple[DataFrame, float]] = []
    for idx, (df, budget) in enumerate(sources):
        if int(budget) <= 0:
            raise ValueError(
                f"token budget for source {idx} must be positive, "
                f"got {budget}"
            )
        from ..functions.text import ws_token_array

        total = df.select(
            F.sum(F.size(ws_token_array(F.col(text_col)))).alias("t")
        ).collect()[0][0] or 0
        rate = 1.0 if total <= int(budget) else int(budget) / float(total)
        rated.append((df, rate))
    return mix_corpora(rated, id_col, seed=seed, source_col=source_col)


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum deterministic sampling — the quota step of corpus
    shaping ("keep 30% of crawl English, all German, drop the rest"):
    keep a row iff ``u(id ':' seed ':' stratum) < rate(stratum)``.
    Rates are keep probabilities in [0, 1] (0 drops the stratum
    outright); strata absent from ``rates`` use ``default_rate``.
    Stratum value participates in the hash, so samples are
    independent across strata; same determinism contract as
    :func:`mix_corpora` (stable across runs, engines, repartitions,
    corpus growth). Rows with NULL id or NULL stratum hash to NULL u
    and are dropped. Scan-shaped (one filter), no shuffle."""
    for k, v in rates.items():
        if not (0.0 <= float(v) <= 1.0):
            raise ValueError(f"rate for stratum {k!r} must be in [0, 1]")
    if not (0.0 <= float(default_rate) <= 1.0):
        raise ValueError("default_rate must be in [0, 1]")
    rate = F.lit(float(default_rate))
    for k, v in rates.items():
        rate = F.when(F.col(strata_col) == F.lit(k), F.lit(float(v))).otherwise(
            rate
        )
    u = _stable_u(
        F.col(id_col),
        F.concat(F.lit(str(int(seed)) + ":"), F.col(strata_col)),
    )
    return df.filter(u < rate)


_SHUFFLE_BUCKETS = 1024


def deterministic_shuffle(
    df: DataFrame, id_col: str, seed: int = 42, rank_col: str = "shuffle_rank"
) -> DataFrame:
    """Global deterministic shuffle — the input-randomization step
    before training-shard writes: ranks rows by the stable per-row
    uniform (tie-broken by id, so the permutation is total and
    reproducible) and attaches the 1-based ``rank_col``. Unlike
    ``orderBy(rand(seed))`` (partition-seeded, layout-dependent) the
    permutation is a pure function of (row id, seed).

    Scale: a naive ``row_number() over (order by u)`` plans as
    ``Exchange SinglePartition`` — every row through one task, the
    textbook 100 TB killer. Instead the global rank is computed
    two-level, the same trick as :func:`..functions.text.
    pack_sequences`: ``bucket = floor(u * 1024)`` (deterministic
    ranges — no sampled boundaries, so no cross-branch
    nondeterminism), a parallel per-bucket ``row_number``, and dense
    global offsets from the tiny per-bucket count aggregate
    (cumulative-summed and broadcast back). floor is monotone in u,
    so bucket-major + in-bucket order IS the global (u, id) order;
    u is uniform, so buckets are balanced by construction. Plan:
    one hash exchange on 1024 bucket keys + a broadcast join —
    verified single-partition-free in ``tests/test_sources.py``.
    NULL ids (NULL u) rank first, matching ASC NULLS FIRST. For
    shard writing, follow with ``.repartitionByRange(n_shards,
    rank_col)`` or write partitioned on ``floor(rank / shard_size)``.
    """
    u = _stable_u(F.col(id_col), str(int(seed)))
    bucket = F.when(u.isNull(), F.lit(-1)).otherwise(
        F.floor(u * F.lit(float(_SHUFFLE_BUCKETS))).cast("long")
    )
    tagged = df.withColumn("__u", u).withColumn("__b", bucket)
    local_w = Window.partitionBy("__b").orderBy(
        F.col("__u").asc_nulls_first(), F.col(id_col).asc_nulls_first()
    )
    ranked = tagged.withColumn("__rn", F.row_number().over(local_w))
    counts = tagged.groupBy("__b").agg(F.count(F.lit(1)).alias("__n"))
    base_w = Window.orderBy("__b").rowsBetween(
        Window.unboundedPreceding, -1
    )
    bases = counts.select(
        "__b", F.coalesce(F.sum("__n").over(base_w), F.lit(0)).alias("__base")
    )
    return (
        ranked.join(F.broadcast(bases), "__b")
        .withColumn(rank_col, (F.col("__base") + F.col("__rn")).cast("int"))
        .drop("__u", "__b", "__rn", "__base")
    )


def write_training_shards(
    df: DataFrame,
    id_col: str,
    path: str,
    n_shards: int,
    text_order: bool = False,
    seed: int = 42,
    file_format: str = "parquet",
) -> str:
    """Materialize the corpus as ``n_shards`` deterministic training
    shards under ``path`` (``shard=K/`` partition directories): rows
    get their :func:`deterministic_shuffle` rank, shards are dealt
    round-robin on it (``(rank-1) % n_shards`` — balanced to ±1 row
    by construction, and a pure function of (ids, seed), so a re-run
    or a different cluster writes byte-identical shard MEMBERSHIP).
    Readers that also want the within-shard order materialized should
    pass ``text_order=True`` to sort each shard's files by rank
    (one extra sort, no extra shuffle: rank order within a
    round-robin shard class is already rank mod n_shards).

    One shuffle to rank (bucketed — see
    :func:`deterministic_shuffle`), one repartition on the shard key
    so each shard is written by one task set. Returns ``path``.
    """
    n = int(n_shards)
    if n <= 0:
        raise ValueError("n_shards must be positive")
    ranked = deterministic_shuffle(df, id_col, seed=seed)
    sharded = ranked.withColumn(
        "shard", ((F.col("shuffle_rank") - 1) % n).cast("int")
    ).repartition(n, "shard")
    if text_order:
        sharded = sharded.sortWithinPartitions("shard", "shuffle_rank")
    (
        sharded.write.format(file_format)
        .mode("overwrite")
        .partitionBy("shard")
        .save(path)
    )
    return path


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: list[tuple[str, float]] | None = None,
    seed: int = 42,
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment for data mixing: adds
    ``split_col`` with the first label whose cumulative weight covers
    ``u(id) = uint32(md5(id ':' seed)[:8 hex]) / 2^32``.

    Unlike ``df.sample``/``rand(seed)`` (partition-seeded: the split
    changes with cluster layout, file order, or AQE re-planning), the
    assignment is a pure function of the ROW ID — stable across runs,
    engines, repartitions, and incremental ingests (a document keeps
    its split when the corpus grows, so eval sets never silently leak
    into train). u is exact in double (integer < 2^32 divided by
    2^32), so the same arithmetic reproduces bit-for-bit in the
    DuckDB oracle. Weight order matters (cumulative CASE chain);
    weights must sum to ~1 (the last label catches the remainder).
    NULL ids hash to NULL (``F.concat`` propagates NULL, matching the
    oracle's ``||``), so every WHEN is false and NULL rows land
    deterministically in the LAST label — in both engines.
    """
    if weights is None:
        weights = [("train", 0.9), ("val", 0.05), ("test", 0.05)]
    if not weights:
        raise ValueError("hash_split needs at least one (label, weight)")
    for label, w in weights:
        if not (float(w) > 0):
            raise ValueError(
                f"hash_split weight for {label!r} must be positive, got {w}"
            )
    head = sum(float(w) for _, w in weights[:-1])
    if head >= 1.0:
        raise ValueError(
            "hash_split weights before the last label sum to "
            f"{head}, which reaches/exceeds 1 — the last label "
            f"({weights[-1][0]!r}) would be unreachable"
        )
    u = _stable_u(F.col(id_col), str(int(seed)))
    acc = 0.0
    expr = None
    for label, w in weights[:-1]:
        acc += float(w)
        cond = u < F.lit(acc)
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    last = weights[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: str | list[str],
    num_buckets: int = 64,
    sort: bool = True,
    mode: str = "overwrite",
    file_format: str = "parquet",
) -> str:
    """Persist as a hash-bucketed (and bucket-sorted) managed table.

    The 100 TB co-location primitive: two tables bucketed the same
    way on their join/aggregation key are joined and grouped with
    **no Exchange** — each task reads matching buckets from both
    sides directly (and with ``sort=True`` the sort-merge join's Sort
    disappears too). For repeatedly-joined corpora (documents ⋈
    token stats, embeddings ⋈ cluster assignments) this converts the
    per-query shuffle of the big table into a one-time write cost.
    Bucket count should be sized so one bucket of the largest table
    fits an executor's memory comfortably (e.g. ~128-512 MB each).

    Spark bucketing is hash(bucket_cols) % num_buckets at write time
    (Hive-compatible layout via ``saveAsTable``); plain
    ``.write.parquet(path)`` cannot express it, which is why this
    goes through the session catalog.
    """
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    writer = (
        df.write.format(file_format)
        .mode(mode)
        .bucketBy(int(num_buckets), *cols)
    )
    if sort:
        writer = writer.sortBy(*cols)
    writer.saveAsTable(table)
    return table


def read_table(spark: SparkSession, name: str) -> DataFrame:
    """Catalog-table scan — bucketed tables keep their bucket spec
    (check ``.explain``: `SelectedBucketsCount` and no Exchange on
    bucket-key joins)."""
    return spark.table(name)


def register_view(df: DataFrame, name: str) -> DataFrame:
    """Materializing-sink stand-in (S4/S5): the reference CREATEs a
    table per stage; in Spark the idiomatic equivalent is a temp view
    over the lazy plan (+ ``.cache()`` where a stage is re-read)."""
    df.createOrReplaceTempView(name)
    return df
