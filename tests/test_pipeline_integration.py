"""Integration tests for the Spark pipeline layers not covered by the
driver-contract oracle: streaming extraction, resume semantics, the
oversize short-circuit, multimodal plumbing, metrics invariants, and
LSH estimator quality."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from sparktika.config import ExtractConfig
from sparktika.pipeline import dedup, metrics, resume, similarity
from sparktika.pipeline.extract import (
    extract_pages,
    extract_pages_with_oversize_shortcircuit,
)
from sparktika.synth import SYNTH_CONFIG, synth_pages

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from sparktika.pipeline.session import build_session

    s = build_session(master="local[8]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="module")
def pages(spark):
    return synth_pages(spark, SF_DIR, with_meta=True).cache()


def test_oversize_shortcircuit_matches_kernel_path(spark, pages):
    """The built-in single-scan oversize short-circuit (JVM-side truncation
    to a 1KB sniff head + true-size column) must produce the same statuses
    and the real document sizes as shipping full payloads to the kernel
    (SURVEY.md O19)."""
    from sparktika.config import ExtractConfig
    from sparktika.pipeline.extract import make_extract_fn

    # reference behavior: full payloads through the kernel (cap applied
    # kernel-side only) — bypass the JVM truncation via a raw mapInArrow
    from sparktika.pipeline.schema import EXTRACTED_SCHEMA

    full_path = (pages.select("url", "html")
                 .mapInArrow(make_extract_fn(SYNTH_CONFIG), EXTRACTED_SCHEMA))
    short_circuit = extract_pages(pages, SYNTH_CONFIG)
    keys = ["status", "content_type_detected"]
    a = {tuple(r[k] for k in keys): r["count"]
         for r in full_path.groupBy(*keys).count().collect()}
    b = {tuple(r[k] for k in keys): r["count"]
         for r in short_circuit.groupBy(*keys).count().collect()}
    assert a == b  # same statuses AND same sniffed mime per row class

    # oversize rows report their TRUE size even though only 1KB crossed Arrow
    over = short_circuit.filter(F.col("status") == "skipped_oversize")
    row = over.select(F.min("n_bytes_in").alias("m")).collect()[0]
    assert row["m"] is not None and row["m"] > SYNTH_CONFIG.max_bytes

    # and the physical plan reads the source exactly once (no union of scans)
    plan = short_circuit._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Union") == 0


def test_resume_pending_shrinks_to_zero(spark, pages):
    """Checkpoint-resume contract: after committing everything, a re-run
    has nothing to do (anti-join returns empty)."""
    done_half = pages.filter(F.col("doc_id") % 2 == 0).select("url")
    pending = resume.pending_pages(pages, done_half)
    n_pending = pending.count()
    assert 0 < n_pending < pages.count()
    all_done = pages.select("url")
    assert resume.pending_pages(pages, all_done).count() == 0


def test_streaming_incremental_extraction(spark, pages):
    """readStream -> mapInPandas kernel -> parquet sink with availableNow:
    first run extracts everything; a second run over the same checkpoint
    extracts NOTHING new (exactly-once resume), then new files are picked
    up incrementally."""
    from sparktika.streaming.windowed import stream_extract_pages

    tmp = tempfile.mkdtemp(prefix="sparktika_stream_")
    src, out, ckpt = f"{tmp}/src", f"{tmp}/out", f"{tmp}/ckpt"
    try:
        five = pages.select("url", "warc_ts", "html", "text", "lang")
        first = five.filter(F.col("url").isNotNull()).limit(100)
        first.write.mode("overwrite").parquet(src)

        q = stream_extract_pages(spark, src, out, ckpt, SYNTH_CONFIG)
        q.awaitTermination(120)
        n1 = spark.read.parquet(out).count()
        assert n1 == 100

        # re-run with no new data: checkpoint prevents reprocessing
        q2 = stream_extract_pages(spark, src, out, ckpt, SYNTH_CONFIG)
        q2.awaitTermination(120)
        assert spark.read.parquet(out).count() == n1

        # drop a new file -> only the delta is processed
        five.limit(150).write.mode("append").parquet(src)
        q3 = stream_extract_pages(spark, src, out, ckpt, SYNTH_CONFIG)
        q3.awaitTermination(120)
        assert spark.read.parquet(out).count() > n1
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_streaming_windowed_rollup_matches_batch(spark):
    """The watermarked streaming rollup over a bounded source must converge
    to the batch rollup (same groups, same counts)."""
    from sparktika.streaming.windowed import hourly_rollup, stream_events, streaming_hourly_rollup

    tmp = tempfile.mkdtemp(prefix="sparktika_events_")
    shutil.copy(f"{SF_DIR}/events.parquet", f"{tmp}/events.parquet")
    events_dir = tmp
    batch = hourly_rollup(spark.read.parquet(events_dir))
    stream = streaming_hourly_rollup(stream_events(spark, events_dir))
    q = (stream.writeStream.format("memory").queryName("rollup_test")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT date_format(hour_start,'yyyy-MM-dd HH:mm:ss') AS hour_start,"
        " event_type, n_events FROM rollup_test").collect()
    want = batch.select("hour_start", "event_type", "n_events").collect()
    # append mode emits only watermark-closed windows; bounded source with
    # availableNow closes all but the final window(s)
    got_set = {(r.hour_start, r.event_type, r.n_events) for r in got}
    want_set = {(r.hour_start, r.event_type, r.n_events) for r in want}
    assert got_set.issubset(want_set)
    assert len(got_set) >= len(want_set) - 10  # only trailing windows may be open


def test_sessionize_native_matches_islands(spark):
    """Spark's built-in session_window and the manual lag+cumsum islands
    implementation must produce identical session multisets (same users,
    bounds, and event counts)."""
    from sparktika.streaming.windowed import sessionize, sessionize_native

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    manual = {(r.user_id, r.n_events, r.session_start, r.session_end)
              for r in sessionize(ev, 30).collect()}
    native = {(r.user_id, r.n_events, r.session_start, r.session_end)
              for r in sessionize_native(ev, 30).collect()}
    assert manual == native and len(manual) > 10
    # per-user session ordinals are contiguous 1..k
    by_user = {}
    for r in sessionize(ev, 30).collect():
        by_user.setdefault(r.user_id, []).append(r.session_seq)
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in by_user.values())


def test_sessionize_gap_boundary(spark):
    """Exactly-30min gaps do NOT split a session (the rule is gap >
    30min); 30min+1us does. Pinned on a hand-built stream."""
    from datetime import datetime, timedelta
    from sparktika.streaming.windowed import sessionize

    t0 = datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, t0, 7),
        (2, t0 + timedelta(minutes=30), 7),                     # same session
        (3, t0 + timedelta(minutes=60, microseconds=1), 7),     # new session
        (4, t0 + timedelta(minutes=61), 7),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp_ntz, user_id long")
    out = sorted((r.session_seq, r.n_events)
                 for r in sessionize(df, 30).collect())
    assert out == [(1, 2), (2, 2)]


def test_streaming_sessionize_converges_to_batch(spark):
    """Watermarked streaming session windows over a bounded source emit
    the same (user, n_events) sessions the batch twin computes (trailing
    still-open sessions may be withheld by the watermark)."""
    from sparktika.streaming.windowed import (sessionize_native,
                                              stream_events,
                                              streaming_sessionize)

    tmp = tempfile.mkdtemp(prefix="sparktika_sess_")
    shutil.copy(f"{SF_DIR}/events.parquet", f"{tmp}/events.parquet")
    batch = sessionize_native(spark.read.parquet(tmp), 30)
    q = (streaming_sessionize(stream_events(spark, tmp), 30)
         .writeStream.format("memory").queryName("sess_test")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r.user_id, r.n_events)
           for r in spark.sql("SELECT user_id, n_events FROM sess_test").collect()}
    want = [(r.user_id, r.n_events) for r in batch.collect()]
    from collections import Counter
    want_c = Counter(want)
    got_list = Counter()
    for r in spark.sql("SELECT user_id, n_events FROM sess_test").collect():
        got_list[(r.user_id, r.n_events)] += 1
    # every emitted session exists in the batch result
    assert all(got_list[k] <= want_c[k] for k in got_list)
    assert sum(got_list.values()) >= 0.8 * sum(want_c.values())


def test_multimodal_fake_decode_plumbing(spark):
    """Binary payload -> mapInPandas feature extraction: deterministic fake
    decoder produces stable dimensions; poisoned rows degrade to status."""
    import hashlib

    from sparktika.pipeline.multimodal import extract_media_features

    rows = [(i, hashlib.blake2b(str(i).encode(), digest_size=32).digest() * 4,
             "image/x-fake") for i in range(20)]
    rows.append((99, None, "image/x-fake"))  # null payload row
    df = spark.createDataFrame(rows, "media_id long, payload binary, media_type string")
    out1 = extract_media_features(df, use_fake=True).collect()
    out2 = extract_media_features(df, use_fake=True).collect()
    by_id1 = {r.media_id: r for r in out1}
    by_id2 = {r.media_id: r for r in out2}
    assert by_id1.keys() == by_id2.keys()
    for mid in by_id1:
        assert (by_id1[mid].width, by_id1[mid].height, by_id1[mid].features) == (
            by_id2[mid].width, by_id2[mid].height, by_id2[mid].features)
    assert all(r.status == "ok" for r in out1)
    # real mode: hash-junk payloads are unrecognized -> status='failed' rows,
    # the run survives (per-row containment)
    failed = extract_media_features(df, use_fake=False).collect()
    assert all(r.status == "failed" for r in failed)


def test_multimodal_real_decode_including_jpeg(spark):
    """Real PNG/BMP/JPEG payloads decode to their synthesized dimensions;
    malformed or truncated payloads degrade to status='failed' rows (the
    run survives — per-row containment)."""
    from sparktika.pipeline.multimodal import extract_media_features
    from sparktika.synth import build_bmp, build_jpeg, build_png, media_dims

    rows = [(i, build_png(i) if i % 2 == 0 else build_bmp(i), "image/x")
            for i in range(12)]
    rows += [(200 + i, build_jpeg(i), "image/jpeg") for i in range(6)]
    rows.append((100, b"\xff\xd8\xff\xe0junkjpeg", "image/jpeg"))
    rows.append((101, build_png(2)[:30], "image/png"))  # truncated
    # SOF-only skeleton with no scan data: failed, not a task error
    import struct as _s
    sof = (b"\xff\xd8" + b"\xff\xc0" + _s.pack(">H", 11) + b"\x08"
           + _s.pack(">HH", 480, 640) + b"\x01\x11\x00" + b"\xff\xd9")
    rows.append((102, sof, "image/jpeg"))
    df = spark.createDataFrame(rows, "media_id long, payload binary, media_type string")
    out = {r.media_id: r for r in extract_media_features(df, use_fake=False).collect()}
    for i in range(12):
        w, h = media_dims(i)
        assert (out[i].status, out[i].width, out[i].height) == ("ok", w, h)
        assert len(out[i].features) == 8
    for i in range(6):
        w, h = media_dims(i)
        r = out[200 + i]
        assert (r.status, r.width, r.height) == ("ok", w, h)
        # solid gray: mean == std-free gray/255 in every channel
        g = round((i * 37 % 256) / 255.0, 6)
        assert r.features[0] == pytest.approx(g, abs=1e-6)
    assert out[100].status == "failed"
    assert out[101].status == "failed"
    assert out[102].status == "failed"


def test_metrics_partition_lineage_invariants(spark, pages):
    ext = extract_pages(pages, SYNTH_CONFIG, num_partitions=8)
    m = metrics.partition_metrics(ext, "test-run").collect()
    assert sum(r.docs_in for r in m) == pages.count()
    # the three buckets partition docs_in exactly (r8 review)
    assert all(r.docs_ok + r.docs_failed + r.docs_other == r.docs_in
               for r in m)
    assert all(r.min_url <= r.max_url for r in m)
    assert len(m) <= 8
    # salting spreads the corpus: no partition owns more than half the docs
    assert max(r.docs_in for r in m) < 0.5 * pages.count()


def test_minhash_lsh_finds_planted_near_dups(spark):
    """Plant exact + near duplicates; LSH at t=0.8 must find the exact ones
    and estimate jaccard ~1.0 for them."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    base = docs.select(F.col("doc_id").alias("key"), "text").filter(F.col("key") < 100)
    exact = base.filter(F.col("key") % 5 == 0).select(
        (F.col("key") + 1000).alias("key"), "text")
    corpus = base.unionByName(exact)
    sigs = dedup.minhash_signatures(corpus, "text", "key")
    pairs = dedup.minhash_lsh_pairs(sigs, threshold=0.8).collect()
    found = {(r.key_a, r.key_b) for r in pairs}
    expected = {(k, k + 1000) for k in range(0, 100, 5)}
    assert expected.issubset(found)
    for r in pairs:
        if (r.key_a, r.key_b) in expected:
            assert r.est_jaccard == 1.0


def test_simhash_planted_exact_dups(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    base = docs.select(F.col("doc_id").alias("key"), "text").filter(F.col("key") < 100)
    exact = base.filter(F.col("key") % 5 == 0).select(
        (F.col("key") + 1000).alias("key"), "text")
    sh = dedup.simhash_keys(base.unionByName(exact), "text", "key")
    pairs = dedup.simhash_near_pairs(sh, max_hamming=3).collect()
    found = {(r.key_a, r.key_b): r.hamming for r in pairs}
    for k in range(0, 100, 5):
        assert found.get((k, k + 1000)) == 0


def test_simhash_hot_bucket_cap_survives_skew(spark):
    """Scale guard: a corpus engineered so one 16-bit chunk value dominates
    (exact dups share ALL chunks) must (a) route the hot bucket through
    sorted-neighborhood instead of the quadratic self-join and (b) still
    find planted exact dups — identical simhashes sort adjacent, so the
    neighborhood pairing keeps them."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    base = docs.select(F.col("doc_id").alias("key"), "text").filter(F.col("key") < 200)
    # 200 copies of one text -> one bucket of >200 members per chunk
    hot = base.filter(F.col("key") == 0).select(
        (F.col("key") + 5000).alias("k2"), "text").crossJoin(
        spark.range(200).select(F.col("id").alias("off"))).select(
        (F.col("k2") + F.col("off")).alias("key"), "text")
    sh = dedup.simhash_keys(base.unionByName(hot), "text", "key")
    # with max_bucket=50 the planted clones are all in hot buckets
    stats = dedup.simhash_bucket_stats(sh, max_bucket=50).collect()
    assert len(stats) >= 1 and all(r.bucket_n > 50 for r in stats)
    pairs = dedup.simhash_near_pairs(sh, max_hamming=3, max_bucket=50,
                                     neighborhood=8).collect()
    found = {(r.key_a, r.key_b): r.hamming for r in pairs}
    # sorted-neighborhood keeps adjacent identical simhashes paired: key 0
    # (same text as the clones) sorts first, clones 5000.. follow
    assert found.get((5000, 5001)) == 0
    assert found.get((0, 5000)) == 0
    # pair count stays ~neighborhood-linear (<= 4 chunks x 8 partners each
    # before dedup), NOT the quadratic 201*200/2 = 20,100 of the old join
    clone_pairs = [p for p in found if p[1] >= 5000]
    assert 0 < len(clone_pairs) <= 201 * 32


def test_token_jaccard_df_cut_drops_stopword_blowup(spark):
    """A token present in every doc must be cut from the join universe
    (and from the size denominators) instead of producing all-pairs."""
    rows = [(i, f"common tok{i} tok{i}x shared{i % 2}") for i in range(50)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = dedup.token_jaccard_pairs(df, "text", "doc_id",
                                      min_jaccard=0.3, max_df=10).collect()
    # 'common' (df=50) is cut; 'shared0'/'shared1' (df=25) are cut too;
    # remaining tokens tok{i}/tok{i}x are unique -> no pairs at all
    assert pairs == []
    # with the cut disabled the stopword makes every pair a candidate
    pairs2 = dedup.token_jaccard_pairs(df, "text", "doc_id",
                                       min_jaccard=0.3, max_df=0).collect()
    assert len(pairs2) > 0


def test_repeated_ngram_spans_planted(spark):
    """A verbatim 8-gram planted in 3 docs surfaces with n_docs=3; within-
    doc repetition counts once; boilerplate present in too many docs is
    capped out (max_docs), never enumerated."""
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, f"start {shared} end"),
        (2, f"{shared} tail tail tail tail tail tail tail tail"),
        (3, f"x {shared} y {shared} z"),  # twice in one doc -> counts once
        (4, "totally unrelated text with eight distinct tokens here now"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.shingle: r.n_docs
           for r in dedup.repeated_ngram_spans(df, "text", "doc_id").collect()}
    import hashlib
    h = hashlib.md5(shared.encode()).hexdigest()
    assert out[h] == 3
    # short docs (<8 tokens) contribute nothing and don't error
    short = spark.createDataFrame([(9, "too short")], "doc_id long, text string")
    assert dedup.repeated_ngram_spans(short, "text", "doc_id").count() == 0
    # max_docs cap: the same 8-gram in every doc is filtered at max_docs=2
    many = spark.createDataFrame([(i, shared) for i in range(5)],
                                 "doc_id long, text string")
    capped = dedup.repeated_ngram_spans(many, "text", "doc_id", max_docs=2)
    assert capped.count() == 0


def test_ann_ivf_recall_vs_bruteforce(spark):
    """IVF (spherical k-means cells + nprobe search) must beat the LSH
    recall floor on the same corpus, and every returned cosine must agree
    exactly with brute force (same rounded expression)."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 20)
    exact = similarity.brute_force_topk(emb, queries, k=5).collect()
    approx = similarity.ann_topk_ivf(emb, queries, k=5,
                                     n_centroids=16, nprobe=4).collect()
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.35, f"recall {recall}"
    escore = {(r.query_id, r.neighbor_id): r.cosine for r in exact}
    ascore = {(r.query_id, r.neighbor_id): r.cosine for r in approx}
    assert all(escore[p] == ascore[p] for p in exact_set & approx_set)
    # per-query output is a legal top-k: <= k rows, ranks 1..n contiguous
    by_q = {}
    for r in approx:
        by_q.setdefault(r.query_id, []).append(r.rank)
    assert all(sorted(v) == list(range(1, len(v) + 1)) and len(v) <= 5
               for v in by_q.values())


def test_ivf_assignment_partitions_corpus(spark):
    """Every corpus vector lands in exactly one cell; probing ALL cells
    makes IVF exhaustive (sanity: equals brute force)."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(120)
    cents = similarity.train_ivf_centroids(emb, n_centroids=8, iters=1)
    assert cents.shape == (8, 64)
    assigned = similarity.ivf_assign(emb, cents, nprobe=1)
    assert assigned.count() == 120
    assert assigned.filter(F.size("centroid_ids") != 1).count() == 0
    queries = emb.filter(F.col("vec_id") < 5)
    exact = {(r.query_id, r.neighbor_id)
             for r in similarity.brute_force_topk(emb, queries, k=3).collect()}
    full = {(r.query_id, r.neighbor_id)
            for r in similarity.ann_topk_ivf(emb, queries, k=3, n_centroids=8,
                                             nprobe=8, train_iters=1).collect()}
    assert full == exact


def test_ann_lsh_recall_vs_bruteforce(spark):
    """LSH ANN must recover a reasonable fraction of exact top-5 neighbors
    (random 64-d embeddings are a worst case for LSH; we pin a floor)."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 20)
    exact = similarity.brute_force_topk(emb, queries, k=5).collect()
    approx = similarity.ann_topk_lsh(emb, queries, k=5, n_tables=16,
                                     planes_per_table=6).collect()
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.2, f"recall {recall}"
    # and LSH output is always a subset of legal pairs with correct cosines
    exact_scores = {(r.query_id, r.neighbor_id): r.cosine for r in exact}
    for r in approx:
        if (r.query_id, r.neighbor_id) in exact_scores:
            assert abs(exact_scores[(r.query_id, r.neighbor_id)] - r.cosine) < 1e-9


def test_extraction_job_end_to_end_with_resume(spark, pages):
    """The full job: first run extracts everything; an interrupted re-run
    (simulated by deleting nothing) extracts zero; after adding new pages,
    only the delta is extracted."""
    import tempfile

    from sparktika.pipeline.job import run_extraction_job

    tmp = tempfile.mkdtemp(prefix="sparktika_job_")
    src, out, met = f"{tmp}/pages", f"{tmp}/out", f"{tmp}/metrics"
    cols = ["url", "warc_ts", "html", "text", "lang"]
    pages.filter(F.col("doc_id") < 200).select(*cols).write.parquet(src)

    m1 = run_extraction_job(spark, src, out, met, SYNTH_CONFIG, num_partitions=4)
    assert not m1["resumed"]
    n1 = m1["docs_extracted"]
    assert n1 > 0
    assert spark.read.parquet(out).count() == n1

    m2 = run_extraction_job(spark, src, out, met, SYNTH_CONFIG, num_partitions=4)
    assert m2["resumed"]
    assert m2["docs_extracted"] == 0

    pages.filter(F.col("doc_id") < 300).select(*cols).write.mode(
        "overwrite").parquet(src)
    m3 = run_extraction_job(spark, src, out, met, SYNTH_CONFIG, num_partitions=4)
    assert m3["resumed"]
    assert 0 < m3["docs_extracted"] <= 100
    lineage = spark.read.parquet(met)
    assert lineage.filter(F.col("run_id") == m1["run_id"]).count() > 0


def test_hash_join_verification_full_match(spark, pages):
    """Byte-identity gate: extraction vs the oracle's expected text must
    hash-match on every comparable url (the north rule's per-row invariant,
    here checked through the Spark verify utility itself)."""
    import duckdb

    from sparktika.pipeline.verify import verify_summary
    from sparktika.synth import PAGES_CTE

    # verification is defined over the deduped corpus (newest per url) —
    # re-crawled urls carry different content by construction
    comparable = resume.newest_per_url(pages.filter(
        (F.col("kind") <= 9) | F.col("kind").isin(12, 13, 14, 15, 16, 17)))
    ext = extract_pages(comparable, SYNTH_CONFIG)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'")
    exp_pdf = con.execute(
        "WITH " + PAGES_CTE +
        "SELECT url, text_expected FROM pages2 WHERE text_expected IS NOT NULL "
        "QUALIFY row_number() OVER (PARTITION BY url ORDER BY warc_ts DESC) = 1").df()
    expected = spark.createDataFrame(exp_pdf)

    s = verify_summary(ext, expected)
    assert s["mismatched"] == 0
    assert s["match_rate"] == 1.0
    assert s["joined"] == ext.count()


def test_salting_defuses_host_byte_skew(spark, pages):
    """North-rule skew requirement: with a crawl laid out by host (the
    natural ingest order) one host owning most bytes concentrates work in
    a few input partitions; salting by xxhash64(url) flattens the
    per-partition byte load. Pinned: salted max-partition byte share is
    several times lower than the host-clustered layout's."""
    from pyspark.sql.functions import spark_partition_id

    # make host000 docs 8x heavier, then lay out the corpus host-clustered
    skewed = pages.withColumn(
        "html",
        F.when(F.col("url").contains("host000"),
               F.concat(*([F.col("html")] * 8))).otherwise(F.col("html")),
    ).select("url", "html")
    clustered = skewed.repartitionByRange(8, "url")  # crawl-order layout

    def max_byte_share(df):
        rows = (df.withColumn("pid", spark_partition_id())
                .groupBy("pid").agg(F.sum(F.length("html")).alias("b")).collect())
        total = sum(r.b for r in rows)
        return max(r.b for r in rows) / total

    clustered_share = max_byte_share(clustered)
    salted_share = max_byte_share(clustered.repartition(8, F.xxhash64("url")))
    # hot layout: ~2.5x the fair 1/8 share; salted: ~1.5x at worst
    assert clustered_share > 0.28
    assert salted_share < 0.20
    assert salted_share < clustered_share / 1.5


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    """Co-located bucketed tables join WITHOUT an exchange on either side —
    the write-time partitioning answer for always-joined keys at 100 TB.
    Plan-audited: no Exchange above either scan; the same join on plain
    parquet shows shuffles."""
    from sparktika.pipeline.io import read_bucketed, write_bucketed

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
        lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        write_bucketed(orders, "b_orders", "o_orderkey", 8, sort_col="o_orderkey")
        write_bucketed(
            lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
            "b_lineitem", "o_orderkey", 8, sort_col="o_orderkey")
        joined = read_bucketed(spark, "b_orders").join(
            read_bucketed(spark, "b_lineitem"), "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:2000]
        # sanity: the same join over non-bucketed sources DOES shuffle
        plain = orders.join(
            lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
            "o_orderkey")
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plain_plan
        # correctness: row counts agree
        assert joined.count() == plain.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_streaming_first_seen_stateful_dedup(spark, tmp_path):
    """applyInPandasWithState cross-batch dedup: each content hash is
    emitted exactly once across micro-batches; later arrivals only bump
    the suppressed counter in state."""
    import datetime as dt

    from sparktika.streaming.stateful import streaming_first_seen

    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)
    src = tmp_path / "pages_stream"
    # batch 1: A twice (within-batch dup), B once
    spark.createDataFrame(
        [("u1", t0, "shaA"), ("u2", t0 + dt.timedelta(seconds=5), "shaA"),
         ("u3", t0, "shaB")],
        "url string, warc_ts timestamp, content_sha string",
    ).coalesce(1).write.parquet(str(src / "f1"))
    # batch 2: B again (cross-batch dup), C new
    spark.createDataFrame(
        [("u4", t0 + dt.timedelta(minutes=1), "shaB"), ("u5", t0, "shaC")],
        "url string, warc_ts timestamp, content_sha string",
    ).coalesce(1).write.parquet(str(src / "f2"))

    schema = "url string, warc_ts timestamp, content_sha string"
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(str(src / "*")))
    q = (streaming_first_seen(stream)
         .writeStream.format("memory").queryName("first_seen")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = {r.content_sha: r for r in spark.sql("SELECT * FROM first_seen").collect()}
    assert set(rows) == {"shaA", "shaB", "shaC"}
    assert rows["shaA"].url == "u1"          # earliest warc_ts wins in-batch
    assert rows["shaA"].n_suppressed == 1    # u2 suppressed
    assert rows["shaB"].n_suppressed in (0, 1)  # u4 suppressed iff 2 batches
    assert rows["shaC"].n_suppressed == 0
    # exactly one emission per sha, ever
    assert spark.sql("SELECT count(*) FROM first_seen").collect()[0][0] == 3


def test_partitioned_write_prunes_at_scan(spark, tmp_path):
    """Date-partitioned layout + a day filter prunes partitions AT THE SCAN
    (the Iceberg-partition-transform story on the parquet fallback): the
    pruned plan reads fewer files and shows the partition filter."""
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    out = str(tmp_path / "events_by_day")
    (events.withColumn("day", F.to_date("ts"))
     .write.partitionBy("day").mode("overwrite").parquet(out))
    part = spark.read.parquet(out)
    one_day = part.select("event_id").filter(
        F.col("day") == part.selectExpr("min(day)").collect()[0][0])
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    # the day predicate reaches the scan as a PARTITION filter (directory
    # pruning), not a post-scan row filter
    assert "PartitionFilters: [isnotnull(day" in plan, plan[:1500]
    import re as _re

    assert _re.search(r"\(day#\d+ = ", plan.split("PartitionFilters", 1)[1][:200])
    # and the scan actually reads a strict subset of the data
    assert 0 < one_day.count() < part.count()


def test_chunking_overlap_and_lossless_reconstruction(spark):
    from sparktika.pipeline.textstats import chunk_text

    txt = "x" * 100 + "abcdefghij" * 45  # 550 chars -> 4 chunks at 200/40
    df = spark.createDataFrame([(1, txt), (2, "short")], "doc_id long, text string")
    rows = sorted([tuple(r) for r in chunk_text(df).collect()])
    short = [r for r in rows if r[0] == 2]
    assert short == [(2, 0, "short", 5)]  # sub-window doc -> single chunk
    long = [r for r in rows if r[0] == 1]
    assert len(long) == 1 + -(-max(0, len(txt) - 200) // 160)
    for k in range(len(long) - 1):
        assert long[k][2][160:] == long[k + 1][2][:40]  # 40-char overlap
    assert "".join(r[2][:160] for r in long[:-1]) + long[-1][2] == txt
    import pytest as _pytest
    with _pytest.raises(ValueError):
        chunk_text(df, chunk_chars=40, overlap=40)


def test_contamination_broadcasts_benchmark_grams(spark):
    """The benchmark side of the decontamination join must broadcast
    (real benchmark suites are tiny next to a crawl) — the corpus scan
    joins map-side with no shuffle before the aggregation."""
    from pyspark.sql import functions as F

    from sparktika.pipeline import dedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    out = dedup.benchmark_contamination(corpus, bench)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    rows = {r["key"]: r["n_shared_grams"] for r in out.collect()}
    assert rows  # planted duplicates guarantee non-degeneracy
    assert all(v >= 1 for v in rows.values())
    assert all(k % 97 != 0 for k in rows)


def test_cap_per_host_bounds_head_host(spark):
    from sparktika.pipeline import resume
    from sparktika.synth import synth_pages

    pages = synth_pages(spark, "/root/testdata/sf0.001")
    kept = resume.cap_per_host(pages, n_per_host=3)
    counts = kept.groupBy("host").count().collect()
    assert counts and all(r["count"] <= 3 for r in counts)
    # the planted head host (50% of urls) must be capped like the tail
    head = [r for r in counts if "host000" in r["host"]]
    assert head and head[0]["count"] == 3


def test_duplicate_clusters_transitivity(spark):
    """A transitive chain (A~B via one shingle, B~C via another, A and C
    share nothing) must land in ONE cluster — the property pairwise dedup
    misses and label propagation exists to provide."""
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta AAA"),
         (2, "alpha beta gamma delta epsilon zeta eta theta BBB "
             "one two three four five six seven eight CCC"),
         (3, "one two three four five six seven eight DDD"),
         (4, "totally unrelated words nine ten eleven twelve thirteen "
             "fourteen fifteen sixteen")],
        "doc_id long, text string")
    from sparktika.pipeline import dedup

    out = {r["key"]: r["cluster"]
           for r in dedup.duplicate_clusters(docs).collect()}
    assert out == {1: 1, 2: 1, 3: 1}  # chain collapses; doc 4 isolated


def test_c4_filter_rules(spark):
    from sparktika.pipeline.textstats import c4_filter

    docs = spark.createDataFrame(
        [(1, "One good long sentence right here.\nAnother fine long "
             "sentence follows now.\nAnd a third proper sentence closes.\n"
             "short one\nno terminal punctuation in this line"),
         (2, "Only two good sentences exist here.\nSecond proper long "
             "sentence right here."),
         (3, "First good long sentence is here.\nSecond good long sentence "
             "is here.\nThird good long sentence too.\nBut lorem ipsum "
             "appears somewhere inside."),
         (4, "Has a brace { in it.\nPlus a good long sentence here.\n"
             "And another good long sentence.\nThird long proper "
             "sentence closes this.")],
        "doc_id long, text string")
    out = {r["key"]: (r["n_lines_kept"], r["keep"])
           for r in c4_filter(docs).collect()}
    assert out[1] == (3, True)    # 3 kept lines, clean page
    assert out[2] == (2, False)   # below min_kept_lines
    assert out[3][1] is False     # lorem ipsum page drop
    assert out[4][1] is False     # brace page drop
    # zero-UDF plan: whole-stage codegen, no Exchange
    plan = c4_filter(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_duplicate_clusters_long_chain_pointer_jumping(spark):
    """A 30-doc pairwise chain (diameter ~29 in the star graph) must
    fully collapse — pointer jumping gives log-diameter convergence
    where plain propagation would exhaust max_iter."""
    import pandas as pd

    rows = []
    for i in range(30):
        link_prev = f"chain link {i - 1} {i} alpha beta gamma delta epsilon"
        link_next = f"chain link {i} {i + 1} alpha beta gamma delta epsilon"
        rows.append((i, (link_prev + " || " + link_next) if i > 0 else link_next))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    from sparktika.pipeline import dedup

    out = {r["key"]: r["cluster"]
           for r in dedup.duplicate_clusters(docs, max_iter=8).collect()}
    assert set(out.values()) == {0}, f"chain split into {set(out.values())}"


def test_c4_filter_empty_forbidden_tuple(spark):
    from sparktika.pipeline.textstats import c4_filter

    docs = spark.createDataFrame(
        [(1, "Good one two three four five.\nGood six seven eight nine "
             "ten.\nGood more words in this line.")],
        "doc_id long, text string")
    out = c4_filter(docs, forbidden=()).collect()
    assert out[0]["keep"] is True


def test_span_ranges_merge_overlapping_windows(spark):
    """Two docs sharing a 10-token run: windows 1..3 (8-grams at token
    offsets 1,2,3) must merge into ONE span [1, 10]; a separate shared
    8-gram later in the doc yields its own island."""
    shared = "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10"
    tail = "t1 t2 t3 t4 t5 t6 t7 t8"
    docs = spark.createDataFrame(
        [(1, shared + " unique middle words here only one " + tail),
         (2, shared + " other fill " + tail)],
        "doc_id long, text string")
    from sparktika.pipeline import dedup

    out = sorted((r["key"], r["span_start"], r["span_end"])
                 for r in dedup.repeated_ngram_span_ranges(docs).collect())
    # doc 1: shared run tokens 1-10, tail starts at token 17 (10+6+1)
    assert (1, 1, 10) in out
    assert (1, 17, 24) in out
    assert (2, 1, 10) in out and (2, 13, 20) in out
    assert len(out) == 4


def test_span_ranges_merge_abutting_ranges(spark):
    """Token ranges that abut with no gap ([1,8] from one repeated gram,
    [9,16] from another) merge into one maximal interval."""
    a = "a1 a2 a3 a4 a5 a6 a7 a8"
    b = "b1 b2 b3 b4 b5 b6 b7 b8"
    docs = spark.createDataFrame(
        [(1, a + " " + b),
         (2, a + " cut filler words to break the straddle grams"),
         (3, "other filler words before the second shared run " + b)],
        "doc_id long, text string")
    from sparktika.pipeline import dedup

    out = sorted((r["key"], r["span_start"], r["span_end"])
                 for r in dedup.repeated_ngram_span_ranges(docs).collect())
    assert (1, 1, 16) in out  # abutting [1,8]+[9,16] merged


def test_deterministic_sample_reproducible_across_partitionings(spark):
    """The sample must be identical regardless of partitioning — the
    property Spark's sample() lacks and reproducible data mixes need."""
    from sparktika.pipeline.textstats import deterministic_sample

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rates = {"en": 0.5, "de": 0.3}
    a = {r["doc_id"] for r in deterministic_sample(docs, rates).collect()}
    b = {r["doc_id"] for r in
         deterministic_sample(docs.repartition(17), rates).collect()}
    assert a == b and a
    # rates roughly honored per stratum (md5 is uniform)
    en_total = docs.filter("lang = 'en'").count()
    en_kept = len({r["doc_id"] for r in
                   deterministic_sample(docs, rates).filter("lang='en'").collect()})
    assert 0.3 * en_total < en_kept < 0.7 * en_total


def test_semantic_dedup_planted_exact_copies(spark):
    """SemDeDup composition: exact planted copies must be flagged with
    recall 1.0 at threshold ~1.0, the originals kept, and clusters must
    actually bound the join (pair search never crosses clusters)."""
    from pyspark.sql import functions as F

    from sparktika.pipeline.similarity import semantic_dedup

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    copies = (emb.filter(F.col("vec_id") % 25 == 0)
              .withColumn("vec_id", F.col("vec_id") + 1_000_000))
    n_planted = copies.count()
    out = semantic_dedup(emb.unionByName(copies), n_clusters=8,
                         threshold=0.999)
    rows = {r["vec_id"]: r for r in out.collect()}
    # every planted copy flagged as dup (its original has the smaller id)
    flagged = [v for v in rows if v >= 1_000_000 and rows[v]["is_dup"]]
    assert len(flagged) == n_planted
    # copies land in the SAME cluster as their originals (exact vectors)
    for v in (v for v in rows if v >= 1_000_000):
        assert rows[v]["cluster"] == rows[v - 1_000_000]["cluster"]
    # originals are kept
    assert all(not rows[v]["is_dup"] for v in rows
               if v < 1_000_000 and (v % 25) == 0)


def test_semantic_dedup_chain_keeps_one_per_group(spark):
    """r4 second review: a~b, b~c similarity chain (a!~c) is ONE group —
    exactly the smallest id survives, not only `a` with `c` over-pruned."""
    from pyspark.sql import Row, functions as F

    from sparktika.pipeline.similarity import semantic_dedup

    import math
    # unit vectors at 0deg, 20deg, 40deg: cos(20deg)=0.94 >= t, cos(40deg)=0.766 < t
    def v(deg):
        r = math.radians(deg)
        return [float(math.cos(r)), float(math.sin(r))] + [0.0] * 6

    emb = spark.createDataFrame([
        Row(vec_id=1, embedding=v(0)),
        Row(vec_id=2, embedding=v(20)),
        Row(vec_id=3, embedding=v(40)),
        Row(vec_id=100, embedding=[0.0] * 7 + [1.0]),  # far-away singleton
    ])
    out = {r["vec_id"]: r["is_dup"]
           for r in semantic_dedup(emb, n_clusters=1, threshold=0.9,
                                   iters=1).collect()}
    assert out == {1: False, 2: True, 3: True, 100: False}


def test_semantic_dedup_leaves_no_cache_entry(spark):
    """r4 verdict item 9: semantic_dedup must not pin executor storage
    across calls. The assignment pass is an eager localCheckpoint (no
    CacheManager entry, blocks GC'd with the plan) rather than an
    unpaired persist() — assert the CacheManager stays empty after a
    full materialization."""
    from pyspark.sql import Row

    from sparktika.pipeline.similarity import semantic_dedup

    spark.catalog.clearCache()  # other tests may legitimately cache
    emb = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float((i * 7 + j) % 5) for j in range(8)])
         for i in range(40)])
    semantic_dedup(emb, n_clusters=2, threshold=0.999, iters=1).collect()
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_null_html_row_is_contained(spark):
    """r5 third review (CONFIRMED repro): a NULL html row turned
    F.length() into Arrow NaN and int(nan) killed the whole task; it
    must yield a status row like any other poisoned document."""
    import datetime

    from pyspark.sql import types as T

    from sparktika.pipeline.extract import extract_pages
    from sparktika.synth import SYNTH_CONFIG

    schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("content_type", T.StringType())])
    df = spark.createDataFrame(
        [("https://x/a.html", datetime.datetime(2024, 1, 1),
          bytearray(b"<html><body>ok page</body></html>"), None),
         ("https://x/null", datetime.datetime(2024, 1, 1), None, None)],
        schema)
    rows = {r["url"]: r["status"]
            for r in extract_pages(df, SYNTH_CONFIG).collect()}
    assert rows["https://x/a.html"] == "ok"
    assert rows["https://x/null"] in ("unsupported", "failed")


def test_iceberg_probe_honest_in_this_sandbox(spark):
    """py4j returns a JavaPackage (not an exception) for missing
    classes; the probe must force a classload so the parquet fallback
    engages (r5 third review, CONFIRMED)."""
    from sparktika.pipeline.io import iceberg_available

    assert iceberg_available(spark) is False  # no Iceberg jar here


def test_verify_null_never_matches_empty(spark):
    """A failed extraction (NULL text) must not verify as a match
    against a golden expecting EMPTY text (r5 third review)."""
    from pyspark.sql import Row

    from sparktika.pipeline.verify import verify_text_hashes

    got = spark.createDataFrame(
        [Row(url="u1", text_extracted=None),
         Row(url="u2", text_extracted="")],
        "url string, text_extracted string")
    want = spark.createDataFrame(
        [Row(url="u1", text_expected=""), Row(url="u2", text_expected="")],
        "url string, text_expected string")
    res = {r["url"]: r["match"]
           for r in verify_text_hashes(got, want).collect()}
    assert res == {"u1": False, "u2": True}


def test_streaming_hourly_schema_matches_batch(spark):
    """hour_start is a formatted string in BOTH twins (invariant 4 —
    the streaming side emitted a raw session-tz timestamp)."""
    from sparktika.streaming.windowed import (hourly_rollup,
                                              stream_events,
                                              streaming_hourly_rollup)

    batch = hourly_rollup(
        spark.read.parquet("/root/testdata/sf0.001/events.parquet"))
    stream = streaming_hourly_rollup(
        stream_events(spark, "/root/testdata/sf0.001/events.parquet"))
    assert dict(stream.dtypes)["hour_start"] == "string"
    assert dict(batch.dtypes)["hour_start"] == "string"


def test_drop_frequent_lines_planted_regimes(spark):
    """CCNet line-frequency boilerplate removal: a line in all docs
    drops, a df==threshold line survives, unique lines survive, and a
    doc whose every line is boilerplate comes back EMPTY (not absent)."""
    from pyspark.sql import Row

    from sparktika.pipeline.dedup import drop_frequent_lines

    rows = [Row(doc_id=i, text="footer every doc\n"
                               f"pair {i // 2}\nbody {i}")
            for i in range(6)]
    rows.append(Row(doc_id=6, text="footer every doc"))
    out = {r.doc_id: r for r in
           drop_frequent_lines(spark.createDataFrame(rows),
                               max_doc_freq=2).collect()}
    assert out[0].text_clean == "pair 0\nbody 0"
    assert out[5].n_removed == 1 and out[5].n_lines == 3
    assert out[6].text_clean == "" and out[6].n_removed == 1
    assert len(out) == 7


def test_ann_ivfpq_recall_matches_ivf_floor(spark):
    """IVF-PQ probes the SAME cells as IVF and re-ranks its ADC shortlist
    with exact cosine, so on this corpus its recall must not fall below
    plain IVF's, and every returned cosine must agree exactly with brute
    force (same rounded expression)."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 20)
    exact = similarity.brute_force_topk(emb, queries, k=5).collect()
    ivf = similarity.ann_topk_ivf(emb, queries, k=5,
                                  n_centroids=16, nprobe=4).collect()
    pq = similarity.ann_topk_ivfpq(emb, queries, k=5,
                                   n_centroids=16, nprobe=4).collect()
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    ivf_recall = len(exact_set & {(r.query_id, r.neighbor_id)
                                  for r in ivf}) / len(exact_set)
    pq_set = {(r.query_id, r.neighbor_id) for r in pq}
    pq_recall = len(exact_set & pq_set) / len(exact_set)
    assert pq_recall >= ivf_recall, (pq_recall, ivf_recall)
    escore = {(r.query_id, r.neighbor_id): r.cosine for r in exact}
    ascore = {(r.query_id, r.neighbor_id): r.cosine for r in pq}
    assert all(escore[p] == ascore[p] for p in exact_set & pq_set)
    by_q = {}
    for r in pq:
        by_q.setdefault(r.query_id, []).append(r.rank)
    assert all(sorted(v) == list(range(1, len(v) + 1)) and len(v) <= 5
               for v in by_q.values())


def test_ivfpq_codes_shape_and_determinism(spark):
    """Every corpus vector encodes to exactly m small codes in one cell;
    the whole index (coarse + codebooks + codes) replays bit-for-bit."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(120)
    cents = similarity.train_ivf_centroids(emb, n_centroids=8, iters=1)
    books = similarity.train_pq_codebooks(emb, cents, m=8, ks=16)
    assert books.shape == (8, 16, 8)
    books2 = similarity.train_pq_codebooks(emb, cents, m=8, ks=16)
    assert (books == books2).all()
    enc = similarity.ivfpq_encode(emb, cents, books).collect()
    assert len(enc) == 120
    for r in enc:
        assert 0 <= r.cell < 8
        assert len(r.codes) == 8
        assert all(0 <= c < 16 for c in r.codes)
    enc2 = similarity.ivfpq_encode(emb, cents, books).collect()
    assert sorted(map(tuple, enc)) == sorted(map(tuple, enc2))


def test_ivfpq_rejects_indivisible_subspaces(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(40)
    cents = similarity.train_ivf_centroids(emb, n_centroids=4, iters=1)
    with pytest.raises(ValueError, match="must divide"):
        similarity.train_pq_codebooks(emb, cents, m=7)


def test_leakage_safe_split_neardups_never_straddle(spark):
    """Planted exact copies (and a transitive chain) must land on the
    SAME side of the split — the whole point of the operator."""
    from pyspark.sql import Row

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [Row(doc_id=i, text=f"unique doc {i} " + " ".join(
        f"w{i}_{j}" for j in range(12))) for i in range(40)]
    # copies 100/101/102 share the same text; 103 chains to 102 via a
    # shared 8-gram but has a distinct tail
    rows += [Row(doc_id=100, text=base + " one two three"),
             Row(doc_id=101, text=base + " four five six"),
             Row(doc_id=102, text=base + " seven eight nine"),
             Row(doc_id=103, text="x0 x1 " + base)]
    df = spark.createDataFrame(rows)
    out = {r.doc_id: (r.group_rep, r.split)
           for r in similarity_or(df)}
    reps = {out[k][0] for k in (100, 101, 102, 103)}
    splits = {out[k][1] for k in (100, 101, 102, 103)}
    assert len(reps) == 1 and len(splits) == 1, (reps, splits)
    # uniques are their own representative
    assert out[5][0] == 5


def similarity_or(df):
    from sparktika.pipeline.dedup import leakage_safe_split

    return leakage_safe_split(df, "text", "doc_id").collect()


def test_leakage_safe_split_reproducible_across_partitionings(spark):
    from sparktika.pipeline.dedup import leakage_safe_split

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    a = sorted(map(tuple, leakage_safe_split(docs).collect()))
    b = sorted(map(tuple,
                   leakage_safe_split(docs.repartition(13)).collect()))
    assert a == b
    # both sides populated at the sf0.001 corpus
    splits = {s for (_, _, s) in a}
    assert splits == {"train", "val"}


def test_table_exists_requires_committed_data(spark, tmp_path):
    """r8 review (repro-confirmed failure mode): a run that crashes
    mid-write leaves the output dir with only _temporary inside;
    treating bare path existence as 'exists' bricked every later
    resume. Only committed data (a _SUCCESS marker or a nonempty
    non-hidden file) counts."""
    import os

    from sparktika.pipeline import io as tio

    p = str(tmp_path / "crashed_out")
    os.makedirs(os.path.join(p, "_temporary", "0"))
    assert not tio.table_exists(spark, p)
    # committed write flips it
    spark.range(3).write.mode("overwrite").parquet(p)
    assert tio.table_exists(spark, p)
    # definitely-missing path stays False
    assert not tio.table_exists(spark, str(tmp_path / "never_written"))
    # r9 (ADVICE): committed partitionBy layout whose top level holds
    # ONLY non-hidden partition directories (no _SUCCESS — markers
    # disabled is common on object stores) must count as committed data
    p2 = str(tmp_path / "partitioned_out")
    (spark.range(4).withColumn("p", F.col("id") % 2)
     .write.partitionBy("p").parquet(p2))
    os.remove(os.path.join(p2, "_SUCCESS"))
    assert tio.table_exists(spark, p2)
    # while a dir holding only _temporary still reads as crashed/first-run
    p3 = str(tmp_path / "crashed_only_tmp")
    os.makedirs(os.path.join(p3, "_temporary"))
    assert not tio.table_exists(spark, p3)


def test_streaming_frontier_filter_matches_batch(spark):
    """robots_filter is stateless per row since the r8 rewrite (no
    window, no per-row id), so it composes UNCHANGED with a Structured
    Streaming frontier: readStream -> robots_filter -> sink must equal
    the batch result row-for-row."""
    from sparktika.pipeline.frontier import robots_filter, rules_from_robots
    from sparktika.synth import build_robots

    rules = rules_from_robots(
        [(f"h{h}", build_robots(h).decode()) for h in range(10)], spark)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    urls = docs.select(
        "doc_id",
        F.concat(F.lit("h"), (F.col("doc_id") % 10).cast("string"))
         .alias("host"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("/private/1/page"))
         .otherwise(F.lit("/public/page")).alias("path"))
    batch = sorted(map(tuple, robots_filter(urls, rules).collect()))

    tmp = tempfile.mkdtemp(prefix="sparktika_frontier_")
    src, out, ckpt = f"{tmp}/src", f"{tmp}/out", f"{tmp}/ckpt"
    try:
        urls.write.mode("overwrite").parquet(src)
        stream = spark.readStream.schema(urls.schema).parquet(src)
        q = (robots_filter(stream, rules)
             .writeStream.format("parquet")
             .option("path", out).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        streamed = sorted(map(tuple, spark.read.parquet(out).collect()))
        assert streamed == batch and len(batch) > 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
