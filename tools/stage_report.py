#!/root/.pyenv/versions/3.11.7/bin/python
"""Join a bench record with its self-distilled stage table and print
per-query attribution rows — the reading aid for bench_stages.json.

Usage: tools/stage_report.py bench_full_rN.json bench_stages_rN.json [prefix]

Columns (per query, summed over that query's 3-4 timed+warmup runs):
  sec        median wall seconds from the bench record (one run)
  runs       timed+warmup runs the stage rows aggregate over
  task/run   per-run task seconds (task_s / runs); with 32 cores a
             fully-parallel compute query has task/run ~= 32 * sec
  cpu%       run_s / task_s (executor compute share of task wall)
  gc%        gc_s / run_s
  sched%     sched_delay_s / task_s
  ovh        sec - task_s/runs/32: wall not covered by task execution
             (driver planning, trigger lifecycle, checkpoint IO) — the
             streaming-tail signature
"""
import json, sys

bench = json.load(open(sys.argv[1]))
stages = json.load(open(sys.argv[2]))["groups"]
prefix = sys.argv[3] if len(sys.argv) > 3 else ""
qs = bench["queries"]
headlines = set()  # headlines get 1 extra warmup; close enough to 4

rows = []
for name, sec in qs.items():
    if not name.startswith(prefix) or sec < 0:
        continue
    g = stages.get(name)
    if not g:
        continue
    runs = 4  # warmup + 3 timed (headlines 5; streaming replays vary)
    task = g["task_s"]
    run = g["run_s"]
    rows.append((name, sec, g["jobs"], task / runs,
                 run / task if task else 0.0,
                 g["gc_s"] / run if run else 0.0,
                 g["sched_delay_s"] / task if task else 0.0,
                 sec - task / runs / 32))

rows.sort(key=lambda r: -r[1])
print(f"{'query':42s} {'sec':>6s} {'jobs':>5s} {'task/run':>8s} "
      f"{'cpu%':>5s} {'gc%':>5s} {'sched%':>6s} {'ovh':>6s}")
for n, sec, jobs, tpr, cpu, gc, sched, ovh in rows:
    print(f"{n:42s} {sec:6.2f} {jobs:5d} {tpr:8.2f} "
          f"{cpu*100:4.0f}% {gc*100:4.0f}% {sched*100:5.0f}% {ovh:6.2f}")
tot = sum(r[1] for r in rows)
print(f"-- {len(rows)} queries, {tot:.1f} s total")
