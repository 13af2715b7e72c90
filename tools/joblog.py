#!/usr/bin/env python3
"""Summarize a Spark event log: per-job wall time, description, stages.

Usage: python3 tools/joblog.py /tmp/graft-events/<app-id> [--min 0.2]

Dev-only measurement aid for the optimization rounds: run a main with
  -Dspark.eventLog.enabled=true -Dspark.eventLog.dir=file:///tmp/graft-events
and feed the resulting file here to see where a query's wall-clock goes
(job-by-job, with setJobDescription labels when present).
"""
import json, sys, collections

def main():
    path = sys.argv[1]
    min_sec = 0.0
    if "--min" in sys.argv:
        min_sec = float(sys.argv[sys.argv.index("--min") + 1])
    jobs = {}
    stage_info = {}
    order = []
    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                props = ev.get("Properties") or {}
                jobs[jid] = {
                    "start": ev["Submission Time"],
                    "desc": props.get("spark.job.description", ""),
                    "callsite": props.get("callSite.short", ""),
                    "stages": ev.get("Stage IDs", []),
                }
                order.append(jid)
            elif e == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["end"] = ev["Completion Time"]
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                stage_info[si["Stage ID"]] = {
                    "name": si.get("Stage Name", ""),
                    "tasks": si.get("Number of Tasks", 0),
                }
    total = 0.0
    rows = []
    for jid in order:
        j = jobs[jid]
        if "end" not in j:
            continue
        dur = (j["end"] - j["start"]) / 1000.0
        total += dur
        names = [stage_info.get(s, {}).get("name", "?") for s in j["stages"]]
        rows.append((dur, jid, j["desc"] or j["callsite"], names))
    print(f"{len(rows)} jobs, sum of job wall times {total:.1f}s")
    print("\n-- chronological (>= %.2fs) --" % min_sec)
    for dur, jid, desc, names in rows:
        if dur >= min_sec:
            print(f"  job {jid:4d} {dur:8.2f}s  {desc[:80]}  stages={names[:3]}")
    print("\n-- by description, descending --")
    agg = collections.Counter()
    cnt = collections.Counter()
    for dur, jid, desc, names in rows:
        key = desc[:80] or "(none)"
        agg[key] += dur
        cnt[key] += 1
    for k, v in agg.most_common(30):
        print(f"  {v:8.2f}s  n={cnt[k]:3d}  {k}")

if __name__ == "__main__":
    main()
