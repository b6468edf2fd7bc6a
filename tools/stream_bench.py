"""Streaming sustained-throughput and flat-latency evidence —
exit-gated.

The streaming wrappers (`jaccard_join_duckdb_spark.streaming`) carry
stream==batch equality and checkpoint-recovery tests, but until this
tool there was no evidence for the property an unbounded 100 TB
ingest actually depends on: **per-micro-batch latency stays FLAT as
cumulative state grows**. A stateful operator whose per-batch cost
creeps with the number of batches already processed (state rescans,
index re-aggregation, cache leaks) is fine in a 3-batch unit test and
dead after a week of ingest — exactly the failure class a unit test
cannot see and this bench gates.

Workloads (deterministic, synthesized in-plan — no RNG; written once
as one parquet file per micro-batch, streamed with
``maxFilesPerTrigger=1`` + ``availableNow``):

1. ``dedup_stream`` — stateful ``dropDuplicates`` exact dedup.
   ``N_DEDUP`` docs, 25% exact duplicates (doc ids ≡ 3 mod 4 repeat
   the text of id-3), shuffled across ``NB_DEDUP`` batches by hash so
   duplicate pairs routinely straddle batch boundaries. State grows
   to ~0.75×N fingerprints by the final trigger.
2. ``near_dedup_stream`` — per-batch MinHash-LSH match against a
   STATIC prebuilt index (`minhash_index` over ``N_INDEX`` corpus
   docs; every 5th query doc embeds a near-copy of an indexed doc, so
   matches exist at a realistic rate). The index is the design's
   whole point: per-batch work must touch only the batch.
3. ``self_near_dedup_stream`` — near-SELF dedup of the ingest (no
   reference corpus): each batch vs all prior state + within batch.
   Here per-trigger cost legitimately GROWS (every batch scans the
   accumulated signature leaves — self-dedup keeps every prior
   document relevant), so this workload is NOT flat-gated; its
   trigger walls are REPORTED so the growth curve is on the record
   (map-side memory-speed scan, no shuffle — see the operator
   docstring for the bucketed-catalog layout that replaces the scan
   at unbounded scale). Gated: union == one-shot
   minhash_near_duplicates over the full ingest, each unordered pair
   exactly once. Runs twice — in-session state (localCheckpoint
   leaves) and DURABLE state (epoch-partitioned catalog tables +
   checkpoint) — both equality-gated against the same batch twin, so
   the durability overhead (two table writes per trigger) is on the
   record as the wall delta between the runs.
4. ``self_near_dedup_stream`` with BUCKETED durable state
   (``state_buckets`` — round 10): the same ingest re-sliced into 40
   triggers. This one IS flat-gated (the bucketed layout removes the
   verification join's state-side shuffle, so per-trigger cost is
   O(batch + candidates) plus a colocated state scan), and the probe
   join's executed plan is asserted to carry EXACTLY ONE hash
   Exchange — the candidate side; the bucketed state scan reads
   pre-partitioned with a shuffle-hash build against it.

Exit-code-gated invariants:

1. EQUALITY — (a) the union of streamed dedup survivors carries each
   fingerprint EXACTLY once and the fingerprint set equals the batch
   twin's (``dedup_stream`` on a static frame); (b) the union of
   per-batch near-dup matches equals ``minhash_match`` of the whole
   query frame (batch boundaries cannot change per-document results).
2. FLATNESS — for each workload, mean wall of the LAST 3 triggers
   ≤ ``FLAT_CAP`` × mean wall of the post-warmup middle triggers.
   Linear state-rescan growth over ≥10 uniform batches would show a
   tail/middle ratio ≥ ~1.9 even before constant overheads are
   subtracted; leaks compound worse. 1.8 passes GC/noise, fails
   growth.
3. PROGRESS SANITY — every trigger processed ≥ 1 row and the number
   of timed triggers matches the file count (rate limiting actually
   split the input; a single mega-batch would gate nothing).

Throughput (rows/s end-to-end per workload) is REPORTED, not gated —
wall-clock on a shared sandbox is not a contract, the flatness ratio
is.

Usage: python tools/stream_bench.py [n_dedup] [n_query]
Prints one JSON line; exit 0 iff all gates hold. Results recorded in
BENCHMARKS.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

VOCAB = 30_000
DOC_TOKENS = 30
NB_DEDUP = 20
NB_NEAR = 10
N_INDEX = 20_000
FLAT_CAP = 1.8
WARMUP = 3  # triggers excluded from the flatness baseline


def _synth_text(seed_col, n_tokens: int, salt: int):
    """Token i of a doc is ``w<xxhash64(seed, i, salt) mod VOCAB>`` —
    fully in-plan, deterministic (same scheme as bloom_bench)."""
    return F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_tokens - 1)),
            lambda i: F.concat(
                F.lit("w"),
                F.pmod(
                    F.xxhash64(seed_col, i, F.lit(salt)), F.lit(VOCAB)
                ).cast("string"),
            ),
        ),
        " ",
    )


def _write_batches(df, path: str, batch_col: str, nb: int) -> None:
    """One parquet file per micro-batch under ``path`` (coalesce(1)
    per slice — the file IS the trigger unit with
    maxFilesPerTrigger=1)."""
    for b in range(nb):
        (
            df.filter(F.col(batch_col) == b)
            .drop(batch_col)
            .coalesce(1)
            .write.mode("append")
            .parquet(path)
        )


def _run_stream(spark, path: str, transform_or_none, sink, schema) -> list:
    """Stream ``path`` one file per trigger; returns sink-entry
    timestamps (monotonic). ``transform_or_none`` maps the streaming
    frame (None = identity) before the foreachBatch sink."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    if transform_or_none is not None:
        stream = transform_or_none(stream)
    ticks: list[float] = []

    def _process(batch_df, epoch_id):
        sink(batch_df, epoch_id)
        ticks.append(time.monotonic())

    q = (
        stream.writeStream.foreachBatch(_process)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return ticks


def _walls(ticks: list[float], t0: float) -> list[float]:
    return [b - a for a, b in zip([t0, *ticks[:-1]], ticks)]


def _flat(walls: list[float]) -> tuple[float, float, float]:
    """(middle_mean, tail_mean, ratio) over post-warmup walls. Too few
    walls to form a baseline (e.g. the source coalesced triggers) →
    ratio inf, so the flatness gate REPORTS the failure instead of
    this helper dying with a ZeroDivisionError before the
    trigger-count gate runs (ADVICE r9)."""
    mid = walls[WARMUP:-3]
    tail = walls[-3:]
    if not mid or not tail:
        return 0.0, 0.0, float("inf")
    mid_mean = sum(mid) / len(mid)
    tail_mean = sum(tail) / len(tail)
    return mid_mean, tail_mean, tail_mean / mid_mean


def main() -> int:
    n_dedup = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_query = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000

    from jaccard_join_duckdb_spark import get_spark
    from jaccard_join_duckdb_spark.operators.dedup import (
        minhash_index,
        minhash_match,
        minhash_near_duplicates,
    )
    from jaccard_join_duckdb_spark.streaming import (
        dedup_stream,
        near_dedup_stream,
        self_near_dedup_stream,
    )

    spark = get_spark(
        app_name="stream-bench",
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="stream_bench_")
    out: dict = {"metric": "stream_bench", "unit": "rows_per_sec"}
    fails: list[str] = []

    try:
        # ---------------- workload 1: stateful exact dedup ----------
        # 25% duplicates: ids ≡ 3 (mod 4) repeat the text of id-3.
        dedup_docs = spark.range(n_dedup).select(
            F.col("id").alias("doc_id"),
            _synth_text(
                F.when(F.col("id") % 4 == 3, F.col("id") - 3).otherwise(
                    F.col("id")
                ),
                DOC_TOKENS,
                1,
            ).alias("text"),
            F.pmod(F.xxhash64("id", F.lit(7)), F.lit(NB_DEDUP)).alias("__b"),
        )
        dpath = os.path.join(work, "dedup")
        _write_batches(dedup_docs, dpath, "__b", NB_DEDUP)
        schema = spark.read.parquet(dpath).schema

        seen: dict[str, int] = {}
        dup_emits = [0]

        def dedup_sink(batch_df, epoch_id):
            for r in batch_df.select("fingerprint").collect():
                if r["fingerprint"] in seen:
                    dup_emits[0] += 1
                seen[r["fingerprint"]] = seen.get(r["fingerprint"], 0) + 1

        t0 = time.monotonic()
        ticks = _run_stream(
            spark,
            dpath,
            lambda s: dedup_stream(s, "doc_id", "text"),
            dedup_sink,
            schema,
        )
        dedup_wall = ticks[-1] - t0
        walls = _walls(ticks, t0)
        batch_fps = {
            r["fingerprint"]
            for r in dedup_stream(
                spark.read.parquet(dpath), "doc_id", "text"
            ).select("fingerprint").collect()
        }
        mid, tail, ratio = _flat(walls)
        out["dedup"] = {
            "rows": n_dedup,
            "triggers": len(ticks),
            "rows_per_sec": round(n_dedup / dedup_wall, 1),
            "wall_s": round(dedup_wall, 3),
            "mid_epoch_s": round(mid, 3),
            "tail_epoch_s": round(tail, 3),
            "flat_ratio": round(ratio, 3),
            "distinct_fps": len(seen),
        }
        if len(ticks) != NB_DEDUP:
            fails.append(f"dedup: {len(ticks)} triggers != {NB_DEDUP} files")
        if dup_emits[0]:
            fails.append(f"dedup: {dup_emits[0]} fingerprints emitted twice")
        if set(seen) != batch_fps:
            fails.append(
                f"dedup: stream fp set ({len(seen)}) != batch twin "
                f"({len(batch_fps)})"
            )
        if ratio > FLAT_CAP:
            fails.append(f"dedup: flat_ratio {ratio:.2f} > {FLAT_CAP}")

        # ---------------- workload 2: static-index near-dup ---------
        corpus = spark.range(N_INDEX).select(
            F.col("id").alias("doc_id"),
            _synth_text(F.col("id"), DOC_TOKENS, 2).alias("text"),
        )
        index = minhash_index(corpus, "doc_id", "text")
        index.band_sigs.count()  # build before the clock starts

        # Every 5th query doc near-copies indexed doc (id/5 mod
        # N_INDEX): same token stream, one token swapped — Jaccard
        # 29/31 ≈ 0.935, above threshold. Others are fresh text.
        near = F.concat(
            _synth_text(
                F.pmod(F.floor(F.col("id") / 5), F.lit(N_INDEX)),
                DOC_TOKENS - 1,
                2,
            ),
            F.lit(" zz"),
            F.col("id").cast("string"),
        )
        qdocs = spark.range(n_query).select(
            (F.col("id") + 1_000_000).alias("doc_id"),
            F.when(F.col("id") % 5 == 0, near)
            .otherwise(_synth_text(F.col("id"), DOC_TOKENS, 3))
            .alias("text"),
            F.pmod(F.xxhash64("id", F.lit(11)), F.lit(NB_NEAR)).alias("__b"),
        )
        qpath = os.path.join(work, "near")
        _write_batches(qdocs, qpath, "__b", NB_NEAR)
        qschema = spark.read.parquet(qpath).schema

        got_pairs: set[tuple[int, int]] = set()

        def near_sink(batch_df, epoch_id):
            for r in batch_df.select("q_id", "c_id").collect():
                got_pairs.add((r["q_id"], r["c_id"]))

        t0 = time.monotonic()
        stream = (
            spark.readStream.schema(qschema)
            .option("maxFilesPerTrigger", 1)
            .parquet(qpath)
        )
        q = near_dedup_stream(
            stream, index, near_sink, "doc_id", "text", threshold=0.8
        )
        # near_dedup_stream owns the writer; time triggers via the
        # sink-observed progress instead.
        q.awaitTermination()
        near_wall = time.monotonic() - t0
        raw = [
            p if isinstance(p, dict) else json.loads(
                p.json if isinstance(getattr(p, "json", None), str)
                else p.json()
            )
            for p in q.recentProgress
        ]
        prog = [
            (p["durationMs"]["triggerExecution"] / 1000.0,
             p["numInputRows"])
            for p in raw
        ]
        nwalls = [w for w, n in prog if n > 0]
        want_pairs = {
            (r["q_id"], r["c_id"])
            for r in minhash_match(
                spark.read.parquet(qpath), index, "doc_id", "text", 0.8
            ).select("q_id", "c_id").collect()
        }
        nmid, ntail, nratio = _flat(nwalls)
        out["near_dedup"] = {
            "rows": n_query,
            "triggers": len(nwalls),
            "rows_per_sec": round(n_query / near_wall, 1),
            "wall_s": round(near_wall, 3),
            "mid_epoch_s": round(nmid, 3),
            "tail_epoch_s": round(ntail, 3),
            "flat_ratio": round(nratio, 3),
            "match_pairs": len(got_pairs),
        }
        if len(nwalls) != NB_NEAR:
            fails.append(f"near: {len(nwalls)} triggers != {NB_NEAR} files")
        if got_pairs != want_pairs:
            fails.append(
                f"near: stream pairs ({len(got_pairs)}) != batch twin "
                f"({len(want_pairs)})"
            )
        if not got_pairs:
            fails.append("near: zero matches — workload degenerate")
        if nratio > FLAT_CAP:
            fails.append(f"near: flat_ratio {nratio:.2f} > {FLAT_CAP}")

        index.unpersist()

        # ---------------- workload 3: near-SELF dedup ---------------
        # n_self docs, ~20% near-copies of an earlier ORIGINAL doc
        # (id-1 ≡ 4 mod 5 is never itself a copy), hashed across
        # NB_NEAR batches so pairs straddle triggers.
        n_self = n_query // 2
        near_self = F.concat(
            _synth_text(F.col("id") - 1, DOC_TOKENS - 1, 4),
            F.lit(" zs"),
            F.col("id").cast("string"),
        )
        sdocs = spark.range(n_self).select(
            F.col("id").alias("doc_id"),
            F.when((F.col("id") % 5 == 0) & (F.col("id") >= 5), near_self)
            .otherwise(_synth_text(F.col("id"), DOC_TOKENS, 4))
            .alias("text"),
            F.pmod(F.xxhash64("id", F.lit(13)), F.lit(NB_NEAR)).alias("__b"),
        )
        spath = os.path.join(work, "self")
        _write_batches(sdocs, spath, "__b", NB_NEAR)
        sschema = spark.read.parquet(spath).schema

        want_self = {
            (r["l_id"], r["r_id"])
            for r in minhash_near_duplicates(
                spark.read.parquet(spath), "doc_id", "text", 0.8
            ).select("l_id", "r_id").collect()
        }

        def _run_self(
            tag: str,
            path: str = spath,
            nb: int = NB_NEAR,
            flat_gate: bool = False,
            **kw,
        ):
            self_pairs: list[tuple[int, int]] = []
            sticks: list[float] = []

            def self_sink(batch_df, epoch_id):
                self_pairs.extend(
                    (r["l_id"], r["r_id"])
                    for r in batch_df.select("l_id", "r_id").collect()
                )
                sticks.append(time.monotonic())

            t0 = time.monotonic()
            sstream = (
                spark.readStream.schema(sschema)
                .option("maxFilesPerTrigger", 1)
                .parquet(path)
            )
            q = self_near_dedup_stream(
                sstream, self_sink, threshold=0.8, **kw
            )
            q.awaitTermination()
            wall = sticks[-1] - t0
            walls = _walls(sticks, t0)
            out[tag] = {
                "rows": n_self,
                "triggers": len(sticks),
                "rows_per_sec": round(n_self / wall, 1),
                "wall_s": round(wall, 3),
                "epoch_walls_s": [round(w, 3) for w in walls],
                "match_pairs": len(self_pairs),
            }
            if len(sticks) != nb:
                fails.append(f"{tag}: {len(sticks)} triggers != {nb} files")
            if len(self_pairs) != len(set(self_pairs)):
                fails.append(f"{tag}: a pair was emitted more than once")
            if set(self_pairs) != want_self:
                fails.append(
                    f"{tag}: stream pairs ({len(set(self_pairs))}) != "
                    f"batch twin ({len(want_self)})"
                )
            if not self_pairs:
                fails.append(f"{tag}: zero matches — workload degenerate")
            if flat_gate:
                mid, tail, ratio = _flat(walls)
                out[tag].update(
                    mid_epoch_s=round(mid, 3),
                    tail_epoch_s=round(tail, 3),
                    flat_ratio=round(ratio, 3),
                )
                if ratio > FLAT_CAP:
                    fails.append(
                        f"{tag}: flat_ratio {ratio:.2f} > {FLAT_CAP}"
                    )

        _run_self("self_near_dedup")
        tbl = "stream_bench_snd_state"
        try:
            _run_self(
                "self_near_dedup_durable",
                checkpoint_dir=os.path.join(work, "snd_ckpt"),
                state_table=tbl,
            )
        finally:
            spark.sql(f"drop table if exists {tbl}_sigs")
            spark.sql(f"drop table if exists {tbl}_arrs")

        # ------ workload 3b: 40-trigger bucketed durable state ------
        # VERDICT r9 #5: the bucketed state layout's per-trigger wall
        # must stay FLAT at 40+ triggers (state by the final trigger:
        # ~24K docs), and the verification join's plan must read the
        # state side pre-partitioned — zero Exchange above the state
        # scan, ShuffledHashJoin building on the candidate side.
        NB_LONG = 40
        sdocs40 = sdocs.drop("__b").withColumn(
            "__b", F.pmod(F.xxhash64("doc_id", F.lit(17)), F.lit(NB_LONG))
        )
        lpath = os.path.join(work, "self40")
        _write_batches(sdocs40, lpath, "__b", NB_LONG)
        tblb = "stream_bench_snd_bucketed"
        try:
            _run_self(
                "self_near_dedup_bucketed40",
                path=lpath,
                nb=NB_LONG,
                flat_gate=True,
                checkpoint_dir=os.path.join(work, "snd_ckpt_b"),
                state_table=tblb,
                state_buckets=8,
            )
            # Plan shape of the bucketed verification attach, built
            # exactly as _process builds it: state side must carry NO
            # Exchange (bucketed scan is pre-partitioned on the join
            # key) — the only Exchange in the join is the trigger-
            # sized candidate side.
            prior = (
                spark.table(f"{tblb}_arrs")
                .filter(F.col("__epoch") < F.lit(10**9))
                .drop("__epoch")
            )
            cands_probe = prior.select(
                F.col("id").alias("lid")
            ).limit(100)
            probe = (
                cands_probe.hint("shuffle_hash")
                .join(
                    prior.select(
                        F.col("id").alias("lid"), F.col("arr").alias("lp")
                    ),
                    "lid",
                    "left",
                )
            )
            plan = probe._jdf.queryExecution().executedPlan().toString()
            n_exchange = plan.count("Exchange hashpartitioning")
            if "ShuffledHashJoin" not in plan:
                fails.append("bucketed probe: no ShuffledHashJoin in plan")
            if n_exchange > 1:
                fails.append(
                    f"bucketed probe: {n_exchange} hash Exchanges — the "
                    "state side must read pre-partitioned (expected <= 1, "
                    "candidate side only)"
                )
            out["bucketed_probe_exchanges"] = n_exchange
        finally:
            spark.sql(f"drop table if exists {tblb}_sigs")
            spark.sql(f"drop table if exists {tblb}_arrs")
    finally:
        shutil.rmtree(work, ignore_errors=True)

    out["pass"] = not fails
    if fails:
        out["fails"] = fails
    print(json.dumps(out))
    return 0 if not fails else 1


if __name__ == "__main__":
    sys.exit(main())
