"""Two-parallelism scaling benchmark (BASELINE.json north_rule).

The 10^12-turn N-vs-4N-executor criterion cannot use a real cluster in this
sandbox; per the round brief it is evidenced by running the SAME job on the
SAME input at two parallelism levels (any N vs 4N cores; default
``local[2]`` vs ``local[8]``, which fits inside the shared host's idle
headroom — see BENCH.md) and reporting throughput at both plus scaling
efficiency
``(tp_4N / tp_N) / 4`` (target ≥ 0.8).

Method (each level in a fresh subprocess = fresh JVM):
1. the driver process generates a deterministic synthetic corpus once
   (``synth_transcripts``, 64 input partitions so both levels see identical
   splittable input) and writes it to parquet;
2. each worker warms up (session + tiny action, excluded from timing), then
   times the full parse → enrich → route(fan-out, persist) → per-sink
   parquet writes + aggregate materialization;
3. efficiency and absolute turns/sec go to stdout as JSON and are recorded
   in BENCH.md / BASELINE.md.

Run:  python bench/scaling.py [--turns 2000000] [--cores 2 8]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

WORKER = r"""
import json, os, sys, time, shutil, tempfile
sys.path.insert(0, {repo!r})
from logpipe_spark.session import build_session
from logpipe_spark.plans.pipeline import PipelineConfig, run_pipeline_fanout
from pyspark.sql import functions as F

# persist_fanout=False: the single-pass fan-out leaves only 3 consumers of
# the enriched frame; recomputing the narrow parse+enrich per consumer is
# cheaper and far more memory-stable than caching (and at 10^12 turns you
# could not MEMORY_AND_DISK the enriched table anyway - you re-scan columnar
# input or checkpoint a stage, see plans/checkpoint.py).
CFG = PipelineConfig(persist_fanout=False)
cores = int(sys.argv[1])
src = sys.argv[2]
spark = build_session(app_name=f"scale{{cores}}", cpus=cores,
                      shuffle_partitions=2 * cores)
df = spark.read.parquet(src)
n_turns = df.count()

# Warmup excluded from timing: run the FULL pipeline once on a small slice
# so whole-stage codegen, Arrow paths, and writer classes are JIT-compiled;
# we measure steady-state throughput, not JVM cold start.
warm_dir = tempfile.mkdtemp(prefix=f"warm{{cores}}_")
wout = run_pipeline_fanout(spark, df.limit(5000), warm_dir, CFG)
wout["agg_per_sink"].write.format("noop").mode("overwrite").save()
wout["agg_conv_spans"].write.format("noop").mode("overwrite").save()
shutil.rmtree(warm_dir, ignore_errors=True)

# Sinks on tmpfs: the sandbox's single shared disk stalls unpredictably
# (D-state load with idle CPU) and does NOT model a cluster, where sink
# bandwidth scales with executor count; tmpfs isolates the compute+shuffle
# scaling that the criterion is about. Best-of-N rejects residual noise.
tmpfs = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
walls = []
loads = []  # host 1-min loadavg after each trial: documents co-tenant noise
for _trial in range(int(sys.argv[3])):
    sink_dir = tempfile.mkdtemp(prefix=f"sinks{{cores}}_", dir=tmpfs)
    t0 = time.perf_counter()
    out = run_pipeline_fanout(spark, df, sink_dir, CFG)
    out["agg_per_sink"].write.format("noop").mode("overwrite").save()
    out["agg_conv_spans"].write.format("noop").mode("overwrite").save()
    walls.append(time.perf_counter() - t0)
    loads.append(float(open("/proc/loadavg").read().split()[0]))
    shutil.rmtree(sink_dir, ignore_errors=True)
wall = min(walls)
print(json.dumps({{"cores": cores, "wall_s": round(wall, 2),
                   "walls": [round(w, 2) for w in walls],
                   "host_load_per_trial": loads,
                   "turns": n_turns,
                   "turns_per_sec": round(n_turns / wall, 1)}}))
spark.stop()
"""


def run_level(cores: int, src: str, trials: int = 3) -> dict:
    script = WORKER.format(repo=str(REPO))
    r = subprocess.run([sys.executable, "-c", script, str(cores), src,
                        str(trials)],
                       capture_output=True, text=True, timeout=3600)
    if r.returncode != 0:
        raise RuntimeError(f"level {cores} failed:\n{r.stderr[-3000:]}")
    return json.loads(r.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=2_000_000)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--cores", type=int, nargs=2, default=[2, 8])
    ap.add_argument("--keep-input", action="store_true")
    args = ap.parse_args()

    sys.path.insert(0, str(REPO))
    from logpipe_spark.session import build_session
    from logpipe_spark.synth import synth_transcripts

    tmp = tempfile.mkdtemp(prefix="scale_input_",
                           dir="/dev/shm" if os.path.isdir("/dev/shm")
                           else None)
    src = os.path.join(tmp, "transcripts")
    gen = build_session(app_name="scale_gen", cpus=32)
    synth_transcripts(gen, n_turns=args.turns, n_convs=args.turns // 200,
                      error_every=50, partitions=64) \
        .write.mode("overwrite").parquet(src)
    gen.stop()

    lo, hi = sorted(args.cores)
    r_lo = run_level(lo, src, args.trials)
    r_hi = run_level(hi, src, args.trials)
    eff = (r_hi["turns_per_sec"] / r_lo["turns_per_sec"]) / (hi / lo)
    result = {
        "metric": "parse->enrich->route->aggregate scaling efficiency "
                  f"local[{lo}] -> local[{hi}]",
        "turns": args.turns,
        f"turns_per_sec_{lo}": r_lo["turns_per_sec"],
        f"turns_per_sec_{hi}": r_hi["turns_per_sec"],
        f"wall_s_{lo}": r_lo["wall_s"],
        f"wall_s_{hi}": r_hi["wall_s"],
        f"walls_{lo}": r_lo["walls"],
        f"walls_{hi}": r_hi["walls"],
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    print(json.dumps(result))
    if not args.keep_input:
        import shutil
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
