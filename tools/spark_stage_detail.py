"""Per-SPARK-stage detail for one pipeline stage (job-description tag).

tools/stage_bytes.py aggregates task metrics per pipeline stage; this tool
drops one level down and prints every Spark stage inside a chosen tag
(default ``europa:pairs``) with its wall, CPU, shuffle and spill bytes plus
the stage name/callsite — enough to see WHICH join or aggregation inside a
fused pipeline stage owns the time.

Usage: python tools/spark_stage_detail.py /tmp/europa_eventlog_32 [tag]
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.stage_bytes import _open_eventlog  # noqa: E402


def main() -> None:
    root = sys.argv[1]
    tag = sys.argv[2] if len(sys.argv) > 2 else "europa:pairs"
    logs = sorted(glob.glob(os.path.join(root, "*")), key=os.path.getmtime)
    path = logs[-1]
    if os.path.isdir(path):
        files = sorted(
            p for p in glob.glob(os.path.join(path, "*"))
            if os.path.basename(p).startswith("events")
        )
    else:
        files = [path]

    stage_to_desc: dict[int, str] = {}
    stage_info: dict[int, dict] = {}
    stage_sub: dict[int, float] = {}

    for fp in files:
        with _open_eventlog(fp) as f:
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
                elif kind == "SparkListenerStageSubmitted":
                    si = ev.get("Stage Info") or {}
                    stage_sub[si.get("Stage ID")] = si.get(
                        "Submission Time", 0
                    )
                elif kind == "SparkListenerStageCompleted":
                    si = ev.get("Stage Info") or {}
                    sid = si.get("Stage ID")
                    info = stage_info.setdefault(
                        sid,
                        {
                            "name": si.get("Stage Name", ""),
                            "tasks": si.get("Number of Tasks", 0),
                            "wall_s": 0.0,
                            "run_s": 0.0,
                            "cpu_s": 0.0,
                            "sw_mb": 0.0,
                            "sr_mb": 0.0,
                            "spill_mb": 0.0,
                            "input_mb": 0.0,
                        },
                    )
                    sub = si.get("Submission Time") or stage_sub.get(sid, 0)
                    comp = si.get("Completion Time", 0)
                    if sub and comp:
                        info["wall_s"] = (comp - sub) / 1e3
                elif kind == "SparkListenerTaskEnd":
                    sid = ev.get("Stage ID")
                    info = stage_info.setdefault(
                        sid,
                        {
                            "name": "",
                            "tasks": 0,
                            "wall_s": 0.0,
                            "run_s": 0.0,
                            "cpu_s": 0.0,
                            "sw_mb": 0.0,
                            "sr_mb": 0.0,
                            "spill_mb": 0.0,
                            "input_mb": 0.0,
                        },
                    )
                    m = ev.get("Task Metrics") or {}
                    info["run_s"] += m.get("Executor Run Time", 0) / 1e3
                    info["cpu_s"] += m.get("Executor CPU Time", 0) / 1e9
                    info["spill_mb"] += (
                        m.get("Memory Bytes Spilled", 0)
                        + m.get("Disk Bytes Spilled", 0)
                    ) / 1e6
                    sw = m.get("Shuffle Write Metrics") or {}
                    info["sw_mb"] += sw.get("Shuffle Bytes Written", 0) / 1e6
                    sr = m.get("Shuffle Read Metrics") or {}
                    info["sr_mb"] += (
                        sr.get("Remote Bytes Read", 0)
                        + sr.get("Local Bytes Read", 0)
                    ) / 1e6
                    im = m.get("Input Metrics") or {}
                    info["input_mb"] += im.get("Bytes Read", 0) / 1e6

    rows = [
        (sid, info)
        for sid, info in sorted(stage_info.items())
        if stage_to_desc.get(sid, "untagged") == tag
    ]
    print(
        f"{'sid':>4} {'wall_s':>7} {'run_s':>8} {'cpu_s':>8} {'sw_mb':>8} "
        f"{'sr_mb':>8} {'spill':>7} {'in_mb':>8}  name"
    )
    for sid, i in rows:
        print(
            f"{sid:>4} {i['wall_s']:>7.1f} {i['run_s']:>8.1f} "
            f"{i['cpu_s']:>8.1f} {i['sw_mb']:>8.0f} {i['sr_mb']:>8.0f} "
            f"{i['spill_mb']:>7.0f} {i['input_mb']:>8.0f}  {i['name'][:70]}"
        )


if __name__ == "__main__":
    main()
