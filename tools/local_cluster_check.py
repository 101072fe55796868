"""Process-boundary check: the sf-pipeline under ``local-cluster`` mode.

Everything else in this repo runs in ONE JVM (local[N]), where closure
serialization, --py-files shipping, and broadcast transport are structurally
untested — a worker-side import or an unserializable closure capture only
fails when tasks cross a real process boundary (r4 VERDICT next-round #5).
``local-cluster[2,4,4096]`` launches two REAL executor processes (4 cores /
4 GiB each): every task ships over RPC, every pandas-UDF worker is spawned
by an executor that never saw the driver's sys.path, and every broadcast
travels the block-transfer service.

The check: build dist/europa_spark.zip (tools/build_pyfiles.py), ship it
via addPyFile, run the FULL dedup pipeline + the LSH pair query on a
planted-truth fixture corpus (seed 11 — different from the pytest seed),
and assert cluster assignments and pair recall against the planted truth.
Prints one JSON line; exits nonzero on any mismatch.

Usage: python tools/local_cluster_check.py
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    # fresh py-files zip from HEAD (a stale zip silently tests old code —
    # the r3 ADVICE dist-zip lesson)
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "build_pyfiles.py")],
        check=True,
    )
    zip_path = os.path.join(REPO, "dist", "europa_spark.zip")

    from europa_spark.fixtures import generate, write_corpus
    from europa_spark.session import build_session

    corpus = generate(800, seed=11, truth=True)
    workdir = tempfile.mkdtemp(prefix="europa_lc_")
    try:
        write_corpus(corpus, workdir)
        spark = build_session(
            app_name="europa-local-cluster-check",
            master="local-cluster[2,4,4096]",
            shuffle_partitions=8,
            # executors are separate JVMs here: keep the DRIVER small and
            # give executors the local-cluster arg's 4096 MiB each
            extra_conf={"spark.driver.memory": "4g"},
        )
        spark.sparkContext.setLogLevel("ERROR")
        # ship the package to the executors' Python workers; the driver
        # imports from the repo checkout, workers from the zip
        spark.sparkContext.addPyFile(zip_path)

        from pyspark.sql import functions as F  # noqa: F401

        from europa_spark.exact import representatives, with_content_hash
        from europa_spark.extract import split_quarantine, with_extracted
        from europa_spark.minhash import minhash_pairs
        from europa_spark.pipeline import run

        n_exec = spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size()
        docs = spark.read.parquet(f"{workdir}/documents.parquet")

        t0 = time.time()
        out = run(docs)
        got_clusters = {
            r["url"]: r["cluster_id"] for r in out["report"].collect()
        }
        out["release"]()
        exp = dict(
            zip(
                corpus.expected_clusters["url"],
                corpus.expected_clusters["cluster_id"],
            )
        )
        cluster_mismatches = sorted(
            u for u, c in exp.items() if got_clusters.get(u, u) != c
        )

        clean, _ = split_quarantine(with_extracted(docs))
        reps = representatives(with_content_hash(clean)).select(
            "url", "extracted"
        )
        pairs = {
            (r["url_a"], r["url_b"]) for r in minhash_pairs(reps).collect()
        }
        planted = {
            (a, b)
            for a, b, m, _ in corpus.expected_pairs.itertuples(index=False)
            if m == "minhash"
        }
        recall = 1 - len(planted - pairs) / max(len(planted), 1)

        # the driver-gate surface too: sf0.01 pipeline + clusters across the
        # same process boundary (the corpus every CORRECTNESS gate runs on)
        from europa_spark.adapters import load_canonical

        sf_docs = load_canonical(spark, "/root/testdata/sf0.01")
        sf_out = run(sf_docs)
        sf_report_rows = sf_out["report"].count()
        sf_dup_rows = sf_out["report"].filter("is_duplicate").count()
        sf_out["release"]()
        wall = time.time() - t0
        spark.stop()

        result = {
            "metric": "local_cluster_check",
            "master": "local-cluster[2,4,4096]",
            "executors_seen": n_exec,  # includes the driver entry
            "rows": 800,
            "cluster_mismatches": len(cluster_mismatches),
            "expected_clustered": len(exp),
            "minhash_recall": round(recall, 4),
            "pairs": len(pairs),
            "sf001_report_rows": sf_report_rows,
            "sf001_duplicate_rows": sf_dup_rows,
            "wall_sec": round(wall, 1),
            "ok": (
                not cluster_mismatches
                and recall >= 0.99
                and sf_report_rows > 0
                and sf_dup_rows > 0
            ),
        }
        print(json.dumps(result))
        if not result["ok"]:
            print("MISMATCHES:", cluster_mismatches[:10], file=sys.stderr)
            sys.exit(1)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
