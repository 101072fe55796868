"""Byte/CPU attribution per pipeline stage, from the Spark event log.

The end-to-end ladder (tools/scaling_bench.py) shows WHICH stages scale
poorly; this tool shows WHY, with measured numbers instead of inference:
for one full pipeline run at a chosen core count it sums, per pipeline
stage (jobs are tagged `europa:<stage>` by pipeline.run):

  * executor run time (task wall) and executor CPU time — their ratio
    separates on-CPU work (incl. memory stalls) from blocked time
    (shuffle fetch, Python worker IPC, scheduling),
  * shuffle bytes written + read and spill bytes — the data actually
    crossing stage boundaries,
  * input bytes read from storage,
  * JVM GC time.

Run at two parallelism levels and compare: a stage whose CPU seconds are
flat across levels but whose wall is not is memory-subsystem-bound; a stage
whose blocked fraction grows with cores is shuffle/IPC-bound.

Usage: EUROPA_BENCH_ROWS=1000000 python tools/stage_bytes.py [cpus]
Appends a stage_bytes record to BENCH/runs.jsonl and prints it.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import ensure_bench_corpus  # noqa: E402


def run_with_eventlog(cpus: int, corpus_dir: str, log_dir: str) -> float:
    from europa_spark.pipeline import run
    from europa_spark.session import build_session

    os.makedirs(log_dir, exist_ok=True)
    spark = build_session(
        app_name=f"europa-stagebytes-{cpus}",
        master=f"local[{cpus}]",
        # same plan the scaling ladder uses; EUROPA_SHUFFLE_PARTS overrides
        # for size-aware runs (per-task sort/hash-build memory scales with
        # data/partitions but execution memory only with 1/concurrency, so
        # multi-million-row corpora need more partitions than cores)
        shuffle_partitions=int(os.environ.get("EUROPA_SHUFFLE_PARTS", "32")),
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{log_dir}",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{corpus_dir}/documents.parquet")
    t0 = time.time()
    out = run(docs)
    out["report"].count()
    out["clusters"].count()
    wall = time.time() - t0
    out["release"]()
    spark.stop()
    return wall


def parse_eventlog(path: str) -> dict[str, dict[str, float]]:
    stage_to_desc: dict[int, str] = {}
    agg: dict[str, dict[str, float]] = {}

    def bucket(desc: str) -> dict[str, float]:
        return agg.setdefault(
            desc,
            {
                "run_s": 0.0,
                "cpu_s": 0.0,
                "gc_s": 0.0,
                "shuffle_write_mb": 0.0,
                "shuffle_read_mb": 0.0,
                "spill_mb": 0.0,
                "input_mb": 0.0,
                "tasks": 0,
            },
        )

    # Spark 4 rolling event logs are DIRECTORIES (eventlog_v2_<app>/events_*)
    if os.path.isdir(path):
        files = sorted(
            p for p in glob.glob(os.path.join(path, "*"))
            if os.path.basename(p).startswith("events")
        )
    else:
        files = [path]
    for fp in files:
        _parse_file(fp, stage_to_desc, bucket)
    return agg


def _open_eventlog(path: str):
    # Spark 4 compresses rolling event logs (zstd by default); the python
    # zstandard module is not in this container, so shell out to the CLI
    if path.endswith(".zstd"):
        import io
        import shutil
        import subprocess

        # PATH-robust: tmux/cron shells may not have the conda bin dir
        zstd = shutil.which("zstd") or "/root/miniconda/bin/zstd"
        proc = subprocess.Popen(
            [zstd, "-dc", path], stdout=subprocess.PIPE
        )
        return io.TextIOWrapper(proc.stdout)
    return open(path)


def _parse_file(path: str, stage_to_desc: dict, bucket) -> None:
    with _open_eventlog(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            kind = ev.get("Event")
            if kind == "SparkListenerJobStart":
                desc = (ev.get("Properties") or {}).get(
                    "spark.job.description"
                ) or "untagged"
                for sid in ev.get("Stage IDs", []):
                    stage_to_desc[sid] = desc
            elif kind == "SparkListenerTaskEnd":
                desc = stage_to_desc.get(ev.get("Stage ID"), "untagged")
                m = ev.get("Task Metrics") or {}
                b = bucket(desc)
                b["tasks"] += 1
                b["run_s"] += m.get("Executor Run Time", 0) / 1e3
                b["cpu_s"] += m.get("Executor CPU Time", 0) / 1e9
                b["gc_s"] += m.get("JVM GC Time", 0) / 1e3
                b["spill_mb"] += (
                    m.get("Memory Bytes Spilled", 0)
                    + m.get("Disk Bytes Spilled", 0)
                ) / 1e6
                sw = m.get("Shuffle Write Metrics") or {}
                b["shuffle_write_mb"] += sw.get("Shuffle Bytes Written", 0) / 1e6
                sr = m.get("Shuffle Read Metrics") or {}
                b["shuffle_read_mb"] += (
                    sr.get("Remote Bytes Read", 0) + sr.get("Local Bytes Read", 0)
                ) / 1e6
                im = m.get("Input Metrics") or {}
                b["input_mb"] += im.get("Bytes Read", 0) / 1e6


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n_rows = int(os.environ.get("EUROPA_BENCH_ROWS", "1000000"))
    corpus_dir = ensure_bench_corpus()
    log_dir = f"/tmp/europa_eventlog_{cpus}"
    for old in glob.glob(f"{log_dir}/*"):
        if os.path.isdir(old):
            import shutil

            shutil.rmtree(old)
        else:
            os.remove(old)
    wall = run_with_eventlog(cpus, corpus_dir, log_dir)
    logs = sorted(glob.glob(f"{log_dir}/*"), key=os.path.getmtime)
    agg = parse_eventlog(logs[-1])

    table = {
        desc.removeprefix("europa:"): {
            k: (round(v, 2) if isinstance(v, float) else v)
            for k, v in row.items()
        }
        for desc, row in sorted(
            agg.items(), key=lambda kv: -kv[1]["run_s"]
        )
    }
    record = {
        "metric": "stage_bytes",
        "value": round(wall, 1),
        "unit": "sec",
        "cpus": cpus,
        "rows": n_rows,
        "stages": table,
        "protocol": (
            "single full-pipeline run, eventLog task-metric sums grouped by"
            " europa:<stage> job description; run_s/cpu_s are summed task"
            " seconds (divide by cores for wall-equivalents)"
        ),
    }
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "BENCH", "runs.jsonl"), "a") as f:
        f.write(json.dumps(record) + "\n")
    print(json.dumps(record, indent=1), flush=True)


if __name__ == "__main__":
    main()
