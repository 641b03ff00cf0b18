"""Noise-immune A/B harness: run labelled query variants and report the
summed EXECUTOR metrics (run time, CPU time, input bytes, shuffle bytes)
per label from the Spark REST API instead of wall clock — the shared VM
has 2-3x wall noise, but bytes scanned and task CPU are properties of
the plan, not the neighbours.

Usage: import from a probe script; see ab() below.
"""

from __future__ import annotations

import json
import time
import urllib.request


def _jobs(sc):
    app_id = sc.applicationId
    base = f"http://localhost:4040/api/v1/applications/{app_id}"
    return base, json.load(urllib.request.urlopen(f"{base}/jobs?status=succeeded"))


def run_labelled(spark, label, df):
    sc = spark.sparkContext
    sc.setJobDescription(label)
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    sc.setJobDescription(None)
    return wall


def metrics_for(spark, label_prefix):
    """Sum stage metrics over all succeeded jobs whose description starts
    with label_prefix."""
    sc = spark.sparkContext
    base, jobs = _jobs(sc)
    stage_ids = set()
    for j in jobs:
        if str(j.get("description", "")).startswith(label_prefix):
            stage_ids.update(j.get("stageIds", []))
    stages = json.load(urllib.request.urlopen(f"{base}/stages?status=complete"))
    agg = {
        "executorRunTime_s": 0.0,
        "executorCpuTime_s": 0.0,
        "inputBytes_mb": 0.0,
        "shuffleRead_mb": 0.0,
        "shuffleWrite_mb": 0.0,
        "tasks": 0,
        "stages": 0,
    }
    for s in stages:
        if s["stageId"] in stage_ids:
            agg["executorRunTime_s"] += s.get("executorRunTime", 0) / 1e3
            agg["executorCpuTime_s"] += s.get("executorCpuTime", 0) / 1e9
            agg["inputBytes_mb"] += s.get("inputBytes", 0) / 1e6
            agg["shuffleRead_mb"] += s.get("shuffleReadBytes", 0) / 1e6
            agg["shuffleWrite_mb"] += s.get("shuffleWriteBytes", 0) / 1e6
            agg["tasks"] += s.get("numCompleteTasks", 0)
            agg["stages"] += 1
    return agg


def ab(spark, sf_dir, variants, passes=2):
    """variants: dict label -> fn(spark, sf_dir) -> DataFrame.
    Interleaves passes, then prints per-label summed metrics (all
    passes) so per-pass noise averages out; per-pass walls shown too."""
    walls = {k: [] for k in variants}
    for p in range(passes):
        for label, fn in variants.items():
            walls[label].append(
                round(run_labelled(spark, f"{label}#p{p}", fn(spark, sf_dir)), 3)
            )
    print(f"{'label':24s} {'walls':24s} {'exRun_s':>8} {'cpu_s':>8} "
          f"{'in_MB':>8} {'shR_MB':>7} {'shW_MB':>7} {'tasks':>6}")
    out = {}
    for label in variants:
        m = metrics_for(spark, label + "#")
        out[label] = m
        print(
            f"{label:24s} {str(walls[label]):24s} {m['executorRunTime_s']:8.2f} "
            f"{m['executorCpuTime_s']:8.2f} {m['inputBytes_mb']:8.1f} "
            f"{m['shuffleRead_mb']:7.2f} {m['shuffleWrite_mb']:7.2f} {m['tasks']:6d}"
        )
    return out
