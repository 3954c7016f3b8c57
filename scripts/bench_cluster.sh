#!/usr/bin/env bash
# Multi-executor scaling evidence on a localhost standalone cluster:
# the SAME spark-submit job at 1 executor (N) vs 4 executors (4N), each
# executor a separate 2-core JVM. Closer to the north rule's "N and 4N
# executors via spark-submit" than local[k] thread scaling: separate heaps,
# separate GC, real RPC + shuffle between processes. Pairs are interleaved
# (N,4N,N,4N,...) with a pair count fixed up front, min per level, every
# rep recorded — the same noise methodology as graft.Bench.
#
# Usage: scripts/bench_cluster.sh [pairs]   (default 3)
# Writes BENCH_CLUSTER.md + BENCH_CLUSTER.json at the repo root.
set -euo pipefail

PAIRS="${1:-3}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
SPARK=/opt/spark
WORK=$(mktemp -d /tmp/graft_cluster.XXXX)
LOGS="$WORK/logs"; mkdir -p "$LOGS" "$WORK/spark-work"
# exact artifact match: the app jar only — -sources/-javadoc/-tests or a
# stale differently-named jar must fail loudly, not silently get benched
mapfile -t JARS < <(ls "$REPO"/target/scala-2.13/pdfextractorspark_2.13-*.jar 2>/dev/null \
  | grep -v -e '-sources\.jar$' -e '-javadoc\.jar$' -e '-tests\.jar$')
if [ "${#JARS[@]}" -ne 1 ]; then
  echo "expected exactly one app jar in target/scala-2.13, found: ${JARS[*]:-none}" >&2
  exit 1
fi
JAR="${JARS[0]}"
MASTER_URL=spark://127.0.0.1:7077

export SPARK_LOCAL_IP=127.0.0.1

# kill ONLY the daemons this script starts (PIDs captured below) — a blanket
# pkill would take down Spark daemons the user runs independently
MASTER_PID=""; WORKER_PID=""
cleanup() {
  [ -n "$WORKER_PID" ] && kill "$WORKER_PID" 2>/dev/null || true
  [ -n "$MASTER_PID" ] && kill "$MASTER_PID" 2>/dev/null || true
}
trap cleanup EXIT

# fail fast if something else already owns the master port
if (exec 3<>/dev/tcp/127.0.0.1/7077) 2>/dev/null; then
  exec 3>&- 3<&-
  echo "port 7077 already in use (another Spark master?) — stop it or change MASTER_URL" >&2
  exit 1
fi

echo "[cluster] starting master + 8-core worker (executors are carved as 2-core JVMs)"
nohup "$SPARK/bin/spark-class" org.apache.spark.deploy.master.Master \
  --host 127.0.0.1 --port 7077 --webui-port 8099 > "$LOGS/master.log" 2>&1 &
MASTER_PID=$!
sleep 8
nohup "$SPARK/bin/spark-class" org.apache.spark.deploy.worker.Worker "$MASTER_URL" \
  --host 127.0.0.1 --cores 8 --memory 24g --work-dir "$WORK/spark-work" \
  --webui-port 8098 > "$LOGS/worker.log" 2>&1 &
WORKER_PID=$!
sleep 8
grep -q "Successfully registered" "$LOGS/worker.log" || { echo "worker failed to register"; exit 1; }

echo "[cluster] generating corpus (untimed)"
"$SPARK/bin/spark-submit" --master "local[8]" --driver-memory 8g \
  --class graft.tools.ClusterBench "$JAR" \
  gen "$WORK/pages" "$WORK/warm" 640 16 2>"$LOGS/gen.log" | grep CLUSTERGEN

# one submit = one fresh driver + executors; warmups run INSIDE the app
submit() { # $1 = cores.max (2 => 1 executor, 8 => 4 executors), $2 = out tag
  "$SPARK/bin/spark-submit" \
    --master "$MASTER_URL" \
    --class graft.tools.ClusterBench \
    --conf spark.cores.max="$1" \
    --conf spark.executor.cores=2 \
    --conf spark.executor.memory=4g \
    --conf spark.driver.memory=4g \
    "$JAR" run "$WORK/pages" "$WORK/warm" "$WORK/out_$2" $((2 * $1)) 2>"$LOGS/submit_$2.log" \
    | grep CLUSTERBENCH
}

declare -a N_RUNS T4_RUNS
for i in $(seq 1 "$PAIRS"); do
  echo "[cluster] pair $i/$PAIRS: N (1 executor x 2 cores)"
  N_RUNS+=("$(submit 2 "n$i")")
  echo "  ${N_RUNS[-1]}"
  echo "[cluster] pair $i/$PAIRS: 4N (4 executors x 2 cores)"
  T4_RUNS+=("$(submit 8 "4n$i")")
  echo "  ${T4_RUNS[-1]}"
done

# artifacts always land at the repo root regardless of invocation CWD
cd "$REPO"
python3 - "$PAIRS" "${N_RUNS[@]}" "${T4_RUNS[@]}" <<'EOF'
import json, sys
pairs = int(sys.argv[1])
rows = [json.loads(a.split(None, 1)[1]) for a in sys.argv[2:]]
nr, fr = rows[:pairs], rows[pairs:]
tn = min(r["wall_s"] for r in nr); t4 = min(r["wall_s"] for r in fr)
docs = nr[0]["docs"]
eff = (tn / t4) / 4
out = {
  "mode": "standalone-cluster localhost, spark-submit",
  "docs": docs,
  "n": {"executors": 1, "cores": 2, "wall_s_min": tn,
         "reps": [r["wall_s"] for r in nr], "docs_per_sec": round(docs/tn, 1)},
  "4n": {"executors": 4, "cores": 8, "wall_s_min": t4,
          "reps": [r["wall_s"] for r in fr], "docs_per_sec": round(docs/t4, 1)},
  "scaling_efficiency": round(eff, 3),
}
json.dump(out, open("BENCH_CLUSTER.json", "w"), indent=2)
md = f"""# BENCH_CLUSTER — multi-executor standalone evidence

Same job, same input, same binary, submitted via `spark-submit` to a
standalone master on localhost at two cluster sizes: **1 executor** vs
**4 executors**, each executor its own 2-core / 4 GiB JVM (separate heap,
separate GC, real RPC + inter-process shuffle). This is the closest the
single-box sandbox gets to the north rule's "N and 4N executors" — beyond
the in-JVM local[k] levels graft.Bench records in BENCH.md. Pairs were
interleaved (N,4N,...) at a pair count fixed before measurement; min per
level; every rep shown. Warm-ups run inside each submitted app, so fresh
driver/executor JVMs do not put cold JIT into the timings.

| level | executors x cores | wall s (min) | all reps s | docs/sec |
|---|---|---|---|---|
| N  | 1 x 2 | {tn:.2f} | {", ".join(f"{r['wall_s']:.1f}" for r in nr)} | {docs/tn:.1f} |
| 4N | 4 x 2 | {t4:.2f} | {", ".join(f"{r['wall_s']:.1f}" for r in fr)} | {docs/t4:.1f} |

**Scaling efficiency (T_N / T_4N) / 4 = {eff:.3f}** (north-rule target >= 0.8).

Corpus: {docs} synthesized pages (HTML/PDF/text mix, host skew embedded,
salted repartition active), generated by `graft.tools.ClusterBench gen`.
Reproduce: `scripts/bench_cluster.sh` (starts the daemons, runs the pairs,
tears down).
"""
open("BENCH_CLUSTER.md", "w").write(md)
print(md)
EOF
