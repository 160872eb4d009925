#!/usr/bin/env python3
"""Benchmark harness (driver contract + north-metric evidence).

Default mode: run the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "docs_per_sec": ..., ...}

--scaling mode: run the flagship extraction job at local[8] AND local[32]
on identical input and report throughput at both plus scaling efficiency
(the sandbox evidence for the north_rule's N vs 4N executor criterion),
appending results to BENCH/BASELINE.md.

Statistics use the reference's benchmark shape (mean/median/min/max,
/root/reference/src/cli/benchmark/main.py:304-332) when --repeat > 1.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _session(cores: int, shuffle_partitions: int | None = None):
    from fa_spark.pipeline import default_session

    sp = shuffle_partitions or max(cores, 16)
    s = default_session(app=f"fa-spark-bench-{cores}", cores=cores,
                       shuffle_partitions=sp)
    s.sparkContext.setLogLevel("ERROR")
    return s


def _force(df) -> int:
    """Fully evaluate a DataFrame (noop sink — no column pruning shortcuts)."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def _warm(spark, cores: int) -> None:
    """Warm the JVM (codegen, parquet reader) AND the Python workers — the
    first ArrowEvalPython stage pays ~100-300 ms/worker for process spawn +
    module import, which would otherwise be billed to the first UDF query."""
    from pyspark.sql import functions as F

    from fa_spark.stages.analyze import minhash_udf

    _force(spark.range(1_000_000).selectExpr("sum(id) as s"))
    warm = spark.range(0, cores * 4, 1, cores).select(
        F.concat(F.lit("warm up tokens "), F.col("id").cast("string")).alias("t")
    )
    _force(warm.select(minhash_udf("t")))


def _synth_pages_df(spark, sf_dir: str, multiplier: int = 1):
    """CC-style pages synthesized from `documents`. ``multiplier`` replicates
    each document into distinct variants (suffix varies, so sha/url differ)
    to make the job compute-bound for the core-scaling measurement."""
    from fa_spark.queries import _synth_pages
    from pyspark.sql import functions as F

    docs = _synth_pages(spark, sf_dir)
    if multiplier > 1:
        docs = docs.crossJoin(
            spark.range(multiplier).select(F.col("id").alias("variant"))
        ).select(
            (F.col("doc_id") * multiplier + F.col("variant")).alias("doc_id"),
            F.concat(
                "html", F.encode(F.concat(F.lit("<!-- v"), "variant", F.lit(" -->")), "utf-8")
            ).alias("html"),
        )
    return docs.select(
        F.concat(F.lit("https://bench.example/"), F.col("doc_id").cast("string")).alias("url"),
        F.to_timestamp(F.lit("2025-01-01 00:00:00")).alias("warc_ts"),
        "html",
        F.lit("").alias("text"),
        F.lit("en").alias("lang"),
    )


def _extraction_job(spark, sf_dir: str, multiplier: int = 1):
    """Flagship: pages -> fused analysis + dedup (the north-metric workload).
    The sf parquet is one file -> one input partition; a production run reads
    an Iceberg table bucketed by url with thousands of splits. Emulate that
    here so the UDF stage has work for every core."""
    from fa_spark.pipeline import JobConfig, analyze_pages

    pages = _synth_pages_df(spark, sf_dir, multiplier)
    par = spark.sparkContext.defaultParallelism * 3
    pages = pages.repartition(par, "url")
    return analyze_pages(pages, JobConfig(run_id="bench"))


HEADLINE = [
    "pricing_summary",
    "nation_revenue",
    "events_sessions",
    "doc_top_tags",
    "global_terms",
    "doc_quality",
    "doc_exact_dedup",
    "ann_topk",
    "minhash_near_dups",
    "extract_synth",
    "pdf_extract",  # added round 2 (north_rule "PDF/layout parse")
    "jpeg_features",  # added round 3 (real baseline-JPEG decode kernel)
]


# BENCH_r01 ran exactly these 11 — the round-over-round comparable subtotal
# is computed over this set in every artifact (later additions excluded).
R1_COMPARABLE = [
    q for q in HEADLINE if q not in ("pdf_extract", "jpeg_features")
] + ["extraction_pipeline"]


def run_headline(
    spark, sf_dir: str, samples: int = 3
) -> tuple[dict[str, float], dict[str, float]]:
    """Best-of-N per query within ONE session (round-2 VERDICT: single-shot
    numbers drift ±2× per-minute under host co-tenancy — min-of-3 plus median
    makes rounds comparable). Returns ({name: min_sec}, {name: median_sec}).
    Session warmup (_warm) runs before any timed query, so worker spawn is
    never billed to the first query."""
    from fa_spark.queries import REGISTRY
    from fa_spark.stages.dedup import release_pair_caches

    mins: dict[str, float] = {}
    medians: dict[str, float] = {}

    def _measure(name, thunk):
        ts = []
        for _ in range(samples):
            t0 = time.perf_counter()
            thunk()
            ts.append(time.perf_counter() - t0)
            # near-dup queries persist signature caches; release between
            # samples so each sample pays the same (cold) cost and a
            # long-lived driver doesn't accumulate blocks (ADVICE r2)
            release_pair_caches()
        mins[name] = round(min(ts), 3)
        medians[name] = round(statistics.median(ts), 3)

    for name in HEADLINE:
        fn = REGISTRY[name][0]
        _measure(name, lambda: _force(fn(spark, sf_dir)))
    _measure("extraction_pipeline", lambda: _force(_extraction_job(spark, sf_dir)))
    return mins, medians


def count_docs(sf_dir: str) -> int:
    import pyarrow.parquet as pq

    return pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows


def bench_once(cpus: int, sf_dir: str, samples: int = 3) -> dict:
    spark = _session(cpus)
    try:
        _warm(spark, cpus)
        mins, medians = run_headline(spark, sf_dir, samples=samples)
    finally:
        spark.stop()
    total = round(sum(mins.values()), 3)
    n_docs = count_docs(sf_dir)
    return {
        "metric": "headline query suite wall time (sum of per-query min-of-%d)"
        % samples,
        "value": total,
        "unit": "sec",
        "queries": mins,
        "queries_median": medians,
        "total_median": round(sum(medians.values()), 3),
        "r1_comparable_subtotal": round(
            sum(mins[q] for q in R1_COMPARABLE if q in mins), 3
        ),
        "samples_per_query": samples,
        "sf": sf_dir,
        "cpus": cpus,
        "n_docs": n_docs,
        "docs_per_sec": round(n_docs / mins["extraction_pipeline"], 1),
    }


def materialize_pages(sf_dir: str, multiplier: int, path: str, files: int = 128) -> int:
    """Write the synthesized pages table to parquet ONCE, outside any timed
    region — production reads a pre-existing bucketed Iceberg table, so the
    timed job must start at the scan, not at input synthesis."""
    import shutil

    shutil.rmtree(path, ignore_errors=True)
    spark = _session(8)
    try:
        df = _synth_pages_df(spark, sf_dir, multiplier)
        df.repartition(files, "url").write.mode("overwrite").parquet(path)
        n = spark.read.parquet(path).count()
    finally:
        spark.stop()
    return n


def extraction_throughput(
    cores: int, pages_path: str, n_docs: int, repeat: int
) -> dict:
    """Measure in a SUBPROCESS pinned to exactly ``cores`` CPUs: in plain
    local[8] on a 32-cpu box the JVM's scan/shuffle/Arrow threads spill onto
    the 24 idle cores, inflating the small-N baseline and corrupting the
    N-vs-4N efficiency measurement. sched_setaffinity is inherited by the
    JVM and every Python worker, so the pinned run is a true N-core cluster
    stand-in."""
    import subprocess

    cmd = [
        sys.executable,
        os.path.abspath(__file__),
        "--worker-cores", str(cores),
        "--pages-path", pages_path,
        "--n-docs", str(n_docs),
        "--repeat", str(repeat),
    ]
    res = subprocess.run(cmd, capture_output=True, text=True, check=True)
    return json.loads(res.stdout.strip().splitlines()[-1])


def _throughput_worker(cores: int, pages_path: str, n_docs: int, repeat: int) -> dict:
    # pin to the TOP `cores` cpus — cpu0 and friends carry OS noise
    n_cpu = os.cpu_count() or 32
    os.sched_setaffinity(0, set(range(n_cpu - cores, n_cpu)))
    from fa_spark.pipeline import JobConfig, analyze_pages

    # repeat=0 -> single measured run with no discarded full-job warmup
    # (paired mode: _warm()'s UDF job + warm page cache suffice)
    n_runs = (repeat + 1) if repeat > 0 else 1
    spark = _session(cores)
    try:
        _warm(spark, cores)
        samples = []
        for _ in range(n_runs):
            pages = spark.read.parquet(pages_path)
            t0 = time.perf_counter()
            _force(analyze_pages(pages, JobConfig(run_id="bench")))
            samples.append(time.perf_counter() - t0)
    finally:
        spark.stop()
    if repeat > 0:
        samples = samples[1:]  # discard warmup (worker spawn, JIT, page cache)
    med = statistics.median(samples)
    return {
        "cores": cores,
        "n_docs": n_docs,
        "secs": {
            "mean": round(statistics.mean(samples), 3),
            "median": round(med, 3),
            "min": round(min(samples), 3),
            "max": round(max(samples), 3),
        },
        "docs_per_sec": round(n_docs / med, 1),
    }


# N and 4N cores. N=2 vs 4N=8: both levels keep cpu headroom for the JVM's
# scan/shuffle/Arrow service threads AND neither saturates this single box's
# shared memory bus — a real cluster's 4N executors bring 4x bandwidth, one
# VM does not, so wider geometries measure the memory bus, not the job.
SCALE_N = 2
SCALE_4N = 8


def bench_scaling_paired(
    sf_dir: str,
    rounds: int = 2,
    multiplier: int | None = None,
    scale_n: int = SCALE_N,
    scale_4n: int = SCALE_4N,
) -> dict:
    """Interleaved N/4N measurement: each round runs both levels back-to-back,
    so host-contention drift (±20% over minutes on this shared VM) hits both
    sides of the ratio equally. Efficiency = median of per-round ratios —
    robust where sequential same-level batches are not. ``scale_n``/
    ``scale_4n`` select the geometry: 2v8 is the official gate (headroom for
    JVM service threads, below the single-box memory-bus ceiling); 8v32 is
    also published for transparency with the bus-ceiling caveat
    (SURVEY §5.2 as written; VERDICT round-1 item 5)."""
    if multiplier is None:
        # target ~300k pages: the 8-core leg must run well past the
        # overhead-bound regime (t >= ~15 s) or the ratio measures JVM
        # fixed costs, not the job — the round-6 diagnosis in
        # BENCH/BASELINE.md (100k-doc samples sat at 0.65-0.79; the
        # same job at 300k measures 0.93-0.98)
        multiplier = max(1, 300_000 // max(count_docs(sf_dir), 1))
    pages_path = "/tmp/fa_bench_pages.parquet"
    n = materialize_pages(sf_dir, multiplier, pages_path)
    ratios = []
    lo_samples, hi_samples = [], []
    for _ in range(rounds):
        # repeat=2 -> best-of-2 per level per round: transient host co-tenancy
        # spikes a single sample by 20%+; min-of-2 filters it
        lo = extraction_throughput(scale_n, pages_path, n, repeat=2)
        hi = extraction_throughput(scale_4n, pages_path, n, repeat=2)
        lo_samples.append(lo["secs"]["min"])
        hi_samples.append(hi["secs"]["min"])
        ratios.append((lo["secs"]["min"] / hi["secs"]["min"]) / (scale_4n / scale_n))
    eff = statistics.median(ratios)
    med_lo = statistics.median(lo_samples)
    med_hi = statistics.median(hi_samples)
    return {
        "metric": f"extraction docs/sec scaling local[{scale_n}] -> local[{scale_4n}] (paired rounds)",
        "value": round(eff, 3),
        "unit": "efficiency",
        "sf": sf_dir,
        "scale_n": scale_n,
        "scale_4n": scale_4n,
        "rounds": [round(r, 3) for r in ratios],
        f"local{scale_n}": {
            "cores": scale_n,
            "n_docs": n,
            "secs": {"median": round(med_lo, 3), "min": round(min(lo_samples), 3),
                     "mean": round(statistics.mean(lo_samples), 3),
                     "max": round(max(lo_samples), 3)},
            "docs_per_sec": round(n / med_lo, 1),
        },
        f"local{scale_4n}": {
            "cores": scale_4n,
            "n_docs": n,
            "secs": {"median": round(med_hi, 3), "min": round(min(hi_samples), 3),
                     "mean": round(statistics.mean(hi_samples), 3),
                     "max": round(max(hi_samples), 3)},
            "docs_per_sec": round(n / med_hi, 1),
        },
    }


def bench_scaling(sf_dir: str, repeat: int = 5, multiplier: int | None = None) -> dict:
    if multiplier is None:
        # target ~150k pages so the job is compute-bound, not overhead-bound
        multiplier = max(1, 150_000 // max(count_docs(sf_dir), 1))
    pages_path = "/tmp/fa_bench_pages.parquet"
    n = materialize_pages(sf_dir, multiplier, pages_path)
    lo = extraction_throughput(SCALE_N, pages_path, n, repeat)
    hi = extraction_throughput(SCALE_4N, pages_path, n, repeat)
    # efficiency = speedup achieved / speedup available (median-of-samples)
    eff = (lo["secs"]["median"] / hi["secs"]["median"]) / (SCALE_4N / SCALE_N)
    return {
        "metric": f"extraction docs/sec scaling local[{SCALE_N}] -> local[{SCALE_4N}]",
        "value": round(eff, 3),
        "unit": "efficiency",
        "sf": sf_dir,
        f"local{SCALE_N}": lo,
        f"local{SCALE_4N}": hi,
    }


def _media_blob(i: int):
    """Deterministic mixed-media fixture #i -> (family, blob). One entry
    per decode tier the multimodal stage distinguishes — real decoders
    AND documented envelope-only stubs — so the census reports what
    fraction of each container family decodes for real this round."""
    from fa_spark import pure

    fam = i % 31
    k = i // 31
    if fam == 0:
        return "wav-pcm", pure.wav_encode([100 * (k % 3)] * 1600, 16000)
    if fam == 1:
        return "wav-ima-adpcm", pure.wav_adpcm_encode([800 + 10 * (k % 5)] * 4)
    if fam == 2:
        return "wav-g711", pure.wav_g711_encode(bytes([0x7F] * 800), "mulaw")
    if fam == 3:
        return "flac", pure.flac_encode([7] * 1600, 16000)
    if fam == 4:
        return "mp3-long", pure.mp3_tone_encode(k % 8, 1 + k % 4)
    if fam == 5:
        return "mp3-bigtable-ct1a", pure.mp3_huff_tone_encode(
            7, 1 + k % 5, 2, 1, k % 16, 1
        )
    if fam == 6:
        return "mp3-short", pure.mp3_short_tone_encode(k % 6, k % 2, 1)
    if fam == 7:
        return "mp3-ms-stereo", pure.mp3_ms_tone_encode(k % 8, 1 + k % 4)
    if fam == 8:
        return "mp1", pure.mp1_tone_encode(k % 32, 1 + k % 3)
    if fam == 9:
        return "mp2", pure.mp2_tone_encode(k % 27, 1 + k % 3)
    if fam == 10:
        return "ogg-vorbis", pure.vorbis_tone_encode(3 + k % 5, 0.25, 4)
    if fam == 11:
        return "ogg-opus", pure.ogg_envelope_encode(
            "opus", 48000, 1, total_samples=4800, n_audio_pages=2
        )
    if fam == 12:
        return "aac-adts", pure.adts_encode(6, 1 + k % 3, 5, 2)
    if fam == 13:
        return "png", pure.png_encode([[(10, 20, (30 + k) % 256)] * 16] * 16)
    if fam == 14:
        return "jpeg", pure.jpeg_encode([[20 + (k * 5) % 200] * 16] * 16,
                                        gray=True)
    if fam == 15:
        return "gif", pure.gif_encode([[(10, 20, (40 + k) % 256)] * 16] * 16)
    grid = [[64 + 16 * (k % 9)] * 48 for _ in range(16)]
    if fam == 16:
        return "mpeg1-i", pure.mpeg1_encode([grid])
    if fam == 17:
        return "mpeg1-ip-fcode2", pure.mpeg1_encode_ip(
            grid, [("wideshift", 17, 2)]
        )
    if fam == 18:
        return "mpeg1-ipb", pure.mpeg1_encode_ipb(grid, -16, [("interp",)])
    if fam == 19:
        return "mp4-avc-env", pure.mp4_envelope_encode(2.0, codec=b"avc1")
    if fam == 20:
        return "webm-vp9-env", pure.webm_envelope_encode(2.0, 320, 180)
    if fam == 21:
        jf = pure.jpeg_encode([[30 + (k * 3) % 180] * 16] * 16, gray=True)
        return "avi-mjpeg", pure.avi_mjpeg_encode([jf], 25, 16, 16)
    if fam == 22:
        return "mp1-stereo", pure.mp1_tone_encode(
            k % 32, 1 + k % 3, amp_exp_r=1 + (k // 3) % 3
        )
    if fam == 23:
        return "mp2-stereo", pure.mp2_tone_encode(
            k % 27, 1 + k % 3, 44100, 128, amp_exp_r=1 + (k // 3) % 3
        )
    if fam == 24:
        return "mp3-intensity", pure.mp3_intensity_tone_encode(
            k % 8, 1 + k % 3, k % 7
        )
    if fam == 25:
        return "mp3-mixed", (
            pure.mp3_mixed_tone_encode(k % 8, None, 0, 1 + k % 3)
            if k % 2
            else pure.mp3_mixed_tone_encode(None, k % 4, (k // 4) % 2,
                                            1 + k % 3)
        )
    if fam == 26:
        # lossy / extended stay the documented envelope tier; lossless
        # moved to its own REAL family below (round 8)
        return "webp-env", pure.webp_encode_envelope(
            ("lossy", "extended")[k % 2], 64 + k, 48 + k
        )
    if fam == 27:
        rows = [[(k % 251, x * 17 % 256, y * 13 % 256) for x in range(16)]
                for y in range(16)]
        opts = (
            {}, {"subtract_green": True}, {"cache_bits": 1 + k % 8},
            {"predictor": k % 14}, {"color": (k % 256, 239, 5)},
            {"palette": True},
        )[k % 6]
        return "webp-vp8l", pure.webp_vp8l_encode(rows, **opts)
    if fam == 28:
        rows = [[(k % 251, x * 17 % 256, y * 17 % 256) for x in range(16)]
                for y in range(16)]
        return "ico", pure.ico_encode([(("png", "bmp")[k % 2], rows)])
    if fam == 29:
        return "avif-env", pure.avif_envelope_encode(
            64 + k, 48 + k, bpp=8 + 2 * (k % 2)
        )
    pal = [(j * 3 % 256, j * 5 % 256, j * 7 % 256) for j in range(256)]
    rows = [[(x + y + k) % 200 for x in range(24)] for y in range(16)]
    return "bmp-rle8", pure.bmp_rle8_encode(rows, pal)


MEDIA_MIX_START = "<!-- media-mix:start -->"
MEDIA_MIX_END = "<!-- media-mix:end -->"


def media_mix_census(cores: int = 8, per_family: int = 24) -> list[dict]:
    """Round-7 (VERDICT r6 #5): decode-tier census over the mixed-media
    fixture set — per container family, what fraction of rows the
    multimodal stage decodes for REAL ('decoded') vs leaves in the
    honest envelope-only tier ('stubbed'). Regenerated into
    BENCH/BASELINE.md each round so subset widening is measurable."""
    import pandas as pd
    from pyspark.sql import functions as F

    from fa_spark.stages.multimodal import extract_media_features

    spark = _session(cores)
    try:
        n = per_family * 31

        def gen(batches):
            for pdf in batches:
                rows = []
                for i in pdf["id"]:
                    fam, blob = _media_blob(int(i))
                    rows.append(
                        {"media_id": int(i), "family": fam, "content": blob}
                    )
                yield pd.DataFrame(
                    rows, columns=["media_id", "family", "content"]
                )

        media = spark.range(n).repartition(cores).mapInPandas(
            gen, "media_id long, family string, content binary"
        )
        media = media.persist()
        feats = extract_media_features(media, mode="describe")
        agg = (
            feats.withColumn("mid", F.col("media_id").cast("long"))
            .join(media.select("media_id", "family"),
                  F.col("mid") == media["media_id"])
            .groupBy("family")
            .agg(
                F.count("*").alias("rows"),
                F.sum((F.col("decode_status") == "decoded").cast("long"))
                .alias("decoded"),
                F.first("content_type").alias("content_type"),
            )
            .orderBy("family")
            .collect()
        )
        media.unpersist()
        return [
            {
                "family": r["family"],
                "content_type": r["content_type"],
                "rows": r["rows"],
                "decoded": r["decoded"],
                "stubbed": r["rows"] - r["decoded"],
                "real_fraction": round(r["decoded"] / r["rows"], 3),
            }
            for r in agg
        ]
    finally:
        spark.stop()


# Approximate web-frequency weights for a Common-Crawl-style media mix
# (VERDICT r7 #7): relative share of each fixture family among media
# payloads a crawl actually serves — images dominate (jpeg/png/webp/gif
# per the public Web Almanac media chapters), mp4/AAC lead video/audio,
# legacy MPEG-1 audio layers and uncompressed containers are tail. The
# uniform census measures per-family fractions; these weights turn it
# into "what fraction of a real crawl's media rows decode for real".
_WEB_WEIGHTS = {
    "jpeg": 40.0, "png": 18.0, "webp-env": 10.0, "webp-vp8l": 5.0,
    "gif": 8.0, "ico": 2.0, "avif-env": 1.5, "bmp-rle8": 0.3,
    "mp4-avc-env": 5.0, "webm-vp9-env": 1.5, "avi-mjpeg": 0.1,
    "mpeg1-i": 0.05, "mpeg1-ip-fcode2": 0.05, "mpeg1-ipb": 0.05,
    "aac-adts": 3.0, "mp3-long": 3.0, "mp3-bigtable-ct1a": 1.0,
    "mp3-ms-stereo": 1.0, "mp3-short": 0.5, "mp3-intensity": 0.25,
    "mp3-mixed": 0.25, "mp2": 0.2, "mp2-stereo": 0.2,
    "mp1": 0.05, "mp1-stereo": 0.05,
    "ogg-opus": 1.0, "ogg-vorbis": 0.5, "flac": 0.3,
    "wav-pcm": 0.5, "wav-ima-adpcm": 0.05, "wav-g711": 0.05,
}


def weighted_census(rows: list[dict]) -> dict:
    """Fold the uniform census into the web-weighted real-decode
    fraction plus the largest stub-mass contributors. Per-family
    fractions are deterministic, so the weighted aggregate is exact
    arithmetic over the same run — no second Spark job."""
    total = sum(_WEB_WEIGHTS.get(r["family"], 0.0) for r in rows)
    real = sum(
        _WEB_WEIGHTS.get(r["family"], 0.0) * r["real_fraction"]
        for r in rows
    )
    stub_mass = sorted(
        (
            (
                r["family"],
                _WEB_WEIGHTS.get(r["family"], 0.0)
                * (1 - r["real_fraction"]) / total,
            )
            for r in rows
        ),
        key=lambda t: -t[1],
    )
    return {
        "weighted_real_fraction": round(real / total, 4),
        "top_stub_contributors": [
            {"family": f, "share_of_crawl": round(s, 4)}
            for f, s in stub_mass[:6] if s > 0
        ],
    }


def write_media_mix_md(rows: list[dict]) -> None:
    """Replace (or append) the marker-delimited media-mix section in
    BENCH/BASELINE.md with this round's census."""
    os.makedirs("BENCH", exist_ok=True)
    table = [
        "",
        MEDIA_MIX_START,
        "## Decode-tier census (regenerated per round: "
        "`python3 bench.py --media-mix`)",
        "",
        "Fraction of each mixed-media fixture family the multimodal stage",
        "decodes for REAL vs leaves in the honest envelope-only stub tier",
        "(the lineage stubbed_rows/stubbed_types accounting gates on the",
        "same subset verdicts).",
        "",
        "| family | sniffed type | rows | decoded | stubbed | real |",
        "|---|---|---|---|---|---|",
    ]
    for r in rows:
        table.append(
            f"| {r['family']} | {r['content_type']} | {r['rows']} "
            f"| {r['decoded']} | {r['stubbed']} | {r['real_fraction']} |"
        )
    wc = weighted_census(rows)
    table += [
        "",
        "### Web-weighted mix (round 8, VERDICT r7 #7)",
        "",
        "Same per-family fractions folded through approximate",
        "Common-Crawl-frequency weights (`bench._WEB_WEIGHTS`: images",
        "dominate, mp4/AAC lead video/audio, legacy layers are tail) —",
        "the real-decode fraction a crawl-shaped corpus would see:",
        "",
        f"**weighted real-decode fraction: "
        f"{wc['weighted_real_fraction']}**",
        "",
        "largest stub contributors (share of weighted crawl mass):",
        "",
    ]
    for c in wc["top_stub_contributors"]:
        table.append(f"- {c['family']}: {c['share_of_crawl']}")
    table += [MEDIA_MIX_END, ""]
    block = "\n".join(table)
    path = "BENCH/BASELINE.md"
    text = ""
    if os.path.exists(path):
        with open(path) as f:
            text = f.read()
    if MEDIA_MIX_START in text and MEDIA_MIX_END in text:
        pre = text[: text.index(MEDIA_MIX_START)]
        post = text[text.index(MEDIA_MIX_END) + len(MEDIA_MIX_END):]
        text = pre.rstrip("\n") + "\n" + block + post.lstrip("\n")
    else:
        text = text + "\n" + block
    with open(path, "w") as f:
        f.write(text)


def write_baseline_md(result: dict, note: str = "") -> None:
    os.makedirs("BENCH", exist_ok=True)
    sn, s4 = result.get("scale_n", SCALE_N), result.get("scale_4n", SCALE_4N)
    lo, hi = result[f"local{sn}"], result[f"local{s4}"]
    rounds = f" · per-round ratios {result['rounds']}" if "rounds" in result else ""
    with open("BENCH/BASELINE.md", "a") as f:
        f.write(
            f"\n## Scaling run — sf_dir={result['sf']}, n_docs={lo['n_docs']}{rounds}\n\n"
            f"| cores | min s | median s | docs/sec |\n|---|---|---|---|\n"
            f"| {sn} | {lo['secs']['min']} | {lo['secs']['median']} | {lo['docs_per_sec']} |\n"
            f"| {s4} | {hi['secs']['min']} | {hi['secs']['median']} | {hi['docs_per_sec']} |\n\n"
            f"**Scaling efficiency ({sn}→{s4} cores): {result['value']}** "
            f"(gate ≥ 0.8 per BASELINE.json north_rule)\n"
            + (f"\n{note}\n" if note else "")
        )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    ap.add_argument("--cpus", type=int, default=DEFAULT_CPUS)
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--rounds", type=int, default=2,
                    help="paired rounds for --scaling/--scaling-wide; more "
                         "rounds = a more robust median under host drift")
    ap.add_argument("--scaling-wide", action="store_true",
                    help="also run the 8v32 geometry (published with the "
                         "single-box memory-bus caveat)")
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--samples", type=int, default=3,
                    help="per-query samples in headline mode (min+median "
                         "reported; co-tenancy noise filter)")
    ap.add_argument("--multiplier", type=int, default=None)
    ap.add_argument("--worker-cores", type=int, default=None)
    ap.add_argument("--pages-path", default=None)
    ap.add_argument("--n-docs", type=int, default=None)
    ap.add_argument("--media-mix", action="store_true",
                    help="run the decode-tier census over the mixed-media "
                         "fixture set and regenerate its BENCH/BASELINE.md "
                         "section")
    args = ap.parse_args()

    if args.worker_cores:
        print(json.dumps(_throughput_worker(
            args.worker_cores, args.pages_path, args.n_docs, args.repeat)))
        return

    if args.media_mix:
        rows = media_mix_census()
        write_media_mix_md(rows)
        print(json.dumps({"metric": "media-mix census", "families": rows}))
        return

    results = []
    if args.scaling:  # official gate geometry first
        result = bench_scaling_paired(
            args.sf_dir, rounds=args.rounds, multiplier=args.multiplier
        )
        write_baseline_md(result)
        results.append(result)
    if args.scaling_wide:  # additional wide geometry (NOT instead of --scaling)
        result = bench_scaling_paired(
            args.sf_dir, rounds=args.rounds, multiplier=args.multiplier,
            scale_n=8, scale_4n=32,
        )
        write_baseline_md(
            result,
            note=("Caveat: 8v32 saturates this single box's shared memory bus "
                  "(raw 4→32-process Python scaling tops at ~0.80 on this VM); "
                  "a real cluster's 4N executors bring 4× memory bandwidth, one "
                  "VM does not. Published for transparency alongside the "
                  "official 2v8 gate (SURVEY §5.2 / round-1 VERDICT item 5)."),
        )
        results.append(result)
    if not results:
        results.append(bench_once(args.cpus, args.sf_dir, samples=args.samples))
    for result in results:
        print(json.dumps(result))


if __name__ == "__main__":
    main()
