"""Adversarial skew bench (north rule "explicit skew handling", proven at
bench scale instead of test scale — r4 VERDICT next-round #6).

Three corpora, identical except for a planted 10% skew block, full pipeline
at local[32] with event-log stage attribution:

  * uniform      — the standard deterministic bench corpus;
  * exact_skew   — 10% of non-null rows overwritten with ONE identical
                   boilerplate text: a 100k-member sha256 group (the exact
                   pass's hot-key shape; FIXTURES block E at 2x scale);
  * neardup_skew — the same 10% get boilerplate + a per-url unique token:
                   100k DISTINCT contents that are mutual near-dups
                   (J ~= 0.97), i.e. one 100k-member clique flooding every
                   LSH band bucket — the mega-bucket shape
                   config.star_only_cap exists for. Without the star-only
                   routing this corpus emits ~1.6e9 candidates; with it the
                   per-band candidate count is linear in the clique size.

Protocol: interleaved fresh-context runs (uniform, exact, neardup) x N so
time-correlated host noise hits all three alike, one discarded uniform
warmup, best-of-N walls; every run writes an event log and reports summed
spill / shuffle bytes and the verified pair + cluster counts (the skew
corpora must still produce the RIGHT answer, not just finish).

Usage: EUROPA_BENCH_ROWS=1000000 EUROPA_SKEW_RUNS=2 python tools/skew_bench.py
Appends a skew_bench record to BENCH/runs.jsonl.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import ensure_bench_corpus  # noqa: E402
from tools.stage_bytes import parse_eventlog  # noqa: E402

RUNS = int(os.environ.get("EUROPA_SKEW_RUNS", "2"))
CPUS = int(os.environ.get("EUROPA_SKEW_CPUS", "32"))
SHUFFLE_PARTS = int(os.environ.get("EUROPA_SHUFFLE_PARTS", "32"))
SKEW_PCT = 10

BOILER = " ".join(f"boiler{i:03d}" for i in range(200))


def ensure_skew_corpus(base_dir: str, kind: str) -> str:
    """Derive a skew corpus from the cached uniform one with DuckDB: 10% of
    non-null-text rows (hash(url) % 10 = 0) get the boilerplate payload —
    identical for exact_skew, plus a unique per-url token for neardup_skew
    (distinct sha256 per row, mutual Jaccard ~0.97)."""
    import duckdb

    out = base_dir.rstrip("/") + f"_{kind}"
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        return out
    os.makedirs(out, exist_ok=True)
    tail = (
        "" if kind == "exact_skew"
        else " || ' zz' || CAST(hash(url) AS VARCHAR)"
    )
    con = duckdb.connect()
    # ROW_GROUP_SIZE must match the uniform corpus layout (~4k rows/group):
    # DuckDB's 122k-row default collapses the scan to 2 row groups = 2 scan
    # tasks, and the pipelined scan+extract+signature chain turns into a
    # 66 s single-task straggler that measures the FILE LAYOUT, not skew
    # handling (diagnosed via per-stage max-task times; the first skew run
    # this round reported 1.9x walls for exactly this reason)
    con.execute(
        f"""
COPY (
  SELECT url, warc_ts, html,
         CASE WHEN text IS NOT NULL AND hash(url) % {100 // SKEW_PCT} = 0
              THEN '{BOILER}'{tail} ELSE text END AS text,
         lang
  FROM '{base_dir}/documents.parquet'
) TO '{out}/documents.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 4096)
"""
    )
    with open(done, "w") as f:
        f.write("ok")
    return out


def one_run(corpus_dir: str, label: str) -> dict:
    from europa_spark.pipeline import run
    from europa_spark.session import build_session

    log_dir = f"/tmp/europa_eventlog_skew_{label}"
    shutil.rmtree(log_dir, ignore_errors=True)
    os.makedirs(log_dir, exist_ok=True)
    spark = build_session(
        app_name=f"europa-skew-{label}",
        master=f"local[{CPUS}]",
        shuffle_partitions=SHUFFLE_PARTS,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{log_dir}",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{corpus_dir}/documents.parquet")
    t0 = time.time()
    out = run(docs)
    n_report = out["report"].count()
    n_dups = out["report"].filter("is_duplicate").count()
    n_clusters = out["clusters"].count()
    wall = time.time() - t0
    out["release"]()
    spark.stop()
    logs = sorted(glob.glob(f"{log_dir}/*"), key=os.path.getmtime)
    agg = parse_eventlog(logs[-1]) if logs else {}
    spill = round(sum(v["spill_mb"] for v in agg.values()), 1)
    shuffle_w = round(sum(v["shuffle_write_mb"] for v in agg.values()), 1)
    stages = {
        d.removeprefix("europa:"): {
            "run_s": round(v["run_s"], 1),
            "spill_mb": round(v["spill_mb"], 1),
            "shuffle_write_mb": round(v["shuffle_write_mb"], 1),
        }
        for d, v in sorted(agg.items(), key=lambda kv: -kv[1]["run_s"])[:8]
    }
    rec = {
        "wall_sec": round(wall, 1),
        "report_rows": n_report,
        "duplicate_rows": n_dups,
        "clusters": n_clusters,
        "spill_mb": spill,
        "shuffle_write_mb": shuffle_w,
        "stages": stages,
    }
    print(f"  {label}: {wall:.1f}s dups={n_dups} clusters={n_clusters} "
          f"spill={spill}MB", flush=True)
    return rec


def main() -> None:
    n_rows = int(os.environ.get("EUROPA_BENCH_ROWS", "1000000"))
    base = ensure_bench_corpus()
    corpora = {
        "uniform": base,
        "exact_skew": ensure_skew_corpus(base, "exact_skew"),
        "neardup_skew": ensure_skew_corpus(base, "neardup_skew"),
    }
    one_run(base, "warmup")  # discarded (JIT + worker spawn)
    runs: dict[str, list[dict]] = {k: [] for k in corpora}
    for _ in range(RUNS):
        for label, d in corpora.items():  # interleaved
            runs[label].append(one_run(d, label))
    summary = {}
    for label, rs in runs.items():
        best = min(rs, key=lambda r: r["wall_sec"])
        summary[label] = {
            "walls_sec": [r["wall_sec"] for r in rs],
            "best": best,
        }
    ratio = {
        k: round(
            summary[k]["best"]["wall_sec"]
            / summary["uniform"]["best"]["wall_sec"],
            3,
        )
        for k in corpora
    }
    record = {
        "metric": "skew_bench",
        "value": ratio["neardup_skew"],
        "unit": "wall_ratio_vs_uniform",
        "cpus": CPUS,
        "rows": n_rows,
        "skew_pct": SKEW_PCT,
        "ratios_vs_uniform": ratio,
        "corpora": summary,
        "protocol": (
            f"{RUNS} interleaved fresh-context full-pipeline runs per corpus "
            f"at local[{CPUS}] after 1 warmup; 10% planted skew "
            "(one exact-dup group / one near-dup clique); best-of walls"
        ),
    }
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "BENCH", "runs.jsonl"), "a") as f:
        f.write(json.dumps(record) + "\n")
    print(json.dumps(record))


if __name__ == "__main__":
    main()
