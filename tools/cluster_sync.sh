#!/bin/bash
# REAL-multi-executor two-cluster-size scaling: the north rule's
# "spark-submit --py-files on a multi-executor cluster at N and 4N
# executors", run literally — two independent Spark STANDALONE
# clusters (master JVM + 1-core worker JVMs + executor JVMs + a
# spark-submit driver each), N and 4N single-core executors, running
# SIMULTANEOUSLY on disjoint taskset-pinned CPU sets so both sizes
# sample the identical host-weather window (same defense as
# tools/scaling_sync.sh; see BENCH/BASELINE.md).
#
# Unlike local[N] (one shared JVM) and local-cluster[n,c,m]
# (in-process test scaffolding), this exercises the full deployment
# surface: cluster manager registration, --py-files code shipping,
# inter-executor shuffle/broadcast over the network stack, and
# per-executor Python workers.  Each worker JVM is pinned to exactly
# one CPU (its executor and that executor's Python workers inherit
# the affinity), so "cluster size N" is physically N executor cores;
# both sides' masters and drivers share one SERVICE CPU range
# outside the counted executor ranges (a real cluster's driver is
# not an executor core — see the comment at the range math).
#
# Usage: cluster_sync.sh [PAIRS]        (default 2)
#   env: CLUSTER_N1=2 CLUSTER_N2=8 BENCH_KG_DOCS=100000
#        SYNC_REPS_NARROW=2 (wide side scales by N2/N1)
set -euo pipefail
cd "$(dirname "$0")/.."

SPARK_HOME="${SPARK_HOME:-/opt/spark}"
DOCS="${BENCH_KG_DOCS:-100000}"
SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
N1="${CLUSTER_N1:-2}"
N2="${CLUSTER_N2:-8}"
PAIRS="${1:-2}"
R1="${SYNC_REPS_NARROW:-2}"
R2="$(( R1 * N2 / N1 ))"
EXEC_MEM="${CLUSTER_EXEC_MEM:-6g}"

mkdir -p BENCH build
rm -f build/engine.zip
(zip -qr build/engine.zip ferenda_spark -x '*__pycache__*')

# Disjoint CPU ranges at the top (cpu0 takes interrupts; unpinned
# external load tends to land low) — wide gets the very top.
# Below the two EXECUTOR ranges sits a shared SERVICE range where
# both sides' master JVMs and spark-submit drivers run: on a real
# cluster the driver/master are not executor cores, and pinning
# them inside the counted range taxes the narrow side
# disproportionately (driver+master overhead / N is 4x larger at
# N1), which manufactures superlinear "scaling".  Sharing ONE
# service range keeps that overhead equal by construction.
hi=$(( $(nproc) - 1 ))
wide_lo=$(( hi - N2 + 1 ))
narrow_hi=$(( wide_lo - 1 ))
narrow_lo=$(( narrow_hi - N1 + 1 ))
svc_hi=$(( narrow_lo - 1 ))
svc_lo=$(( svc_hi - ${CLUSTER_SVC_CPUS:-4} + 1 ))
SVC="${svc_lo}-${svc_hi}"

PIDS=()
cleanup() { kill -9 "${PIDS[@]}" 2>/dev/null || true; }
trap cleanup EXIT

start_cluster() { # $1=port $2=lo $3=hi $4=tag  -> master on SVC, workers pinned
  local port="$1" lo="$2" chi="$3" tag="$4"
  taskset -c "$SVC" "$SPARK_HOME/bin/spark-class" \
    org.apache.spark.deploy.master.Master -h 127.0.0.1 -p "$port" \
    --webui-port $(( port + 1000 )) > "BENCH/cluster_${tag}_master.log" 2>&1 &
  PIDS+=($!)
  sleep 5
  local i=0
  for cpu in $(seq "$lo" "$chi"); do
    taskset -c "$cpu" "$SPARK_HOME/bin/spark-class" \
      org.apache.spark.deploy.worker.Worker "spark://127.0.0.1:$port" \
      -c 1 -m "$EXEC_MEM" --webui-port $(( port + 2000 + i )) \
      > "BENCH/cluster_${tag}_worker$i.log" 2>&1 &
    PIDS+=($!)
    i=$(( i + 1 ))
  done
  sleep 6
}

run_side() { # $1=port $2=n_exec $3=UNUSED $4=pair $5=in-jvm reps $6=tag
  local t0 t1
  t0=$(date +%s.%N)
  BENCH_MASTER="spark://127.0.0.1:$1" SPARK_SHUFFLE_PARTITIONS="$2" \
  BENCH_KG_DOCS="$DOCS" SPARK_GRAFT_SF_DIR="$SF_DIR" \
  BENCH_KG_ONLY=1 BENCH_KG_REPS="$5" \
  taskset -c "$SVC" "$SPARK_HOME/bin/spark-submit" \
    --master "spark://127.0.0.1:$1" --driver-memory 12g \
    --conf spark.executor.memory="$EXEC_MEM" \
    --conf spark.executor.cores=1 \
    --conf spark.python.worker.reuse=false \
    --py-files build/engine.zip \
    bench.py 2>"BENCH/cluster_${6}_p$4.log" | tail -1 \
    > "BENCH/cluster_${6}_p$4.json"
  t1=$(date +%s.%N)
  python3 - "$6" "$4" "$t0" "$t1" "$2" <<'PYEOF'
import json, sys
tag, p, t0, t1, n = sys.argv[1:]
f = f"BENCH/cluster_{tag}_p{p}.json"
d = json.load(open(f))
d["t_start"], d["t_end"], d["executors"] = float(t0), float(t1), int(n)
json.dump(d, open(f, "w"))
print(f"  cluster {tag} ({n} exec) pair{p}: "
      f"{d['kg']['triples_per_sec']} t/s (reps {d['kg'].get('rep_secs')})",
      file=sys.stderr)
PYEOF
}

# shared input parquet must exist before concurrent readers
if [ ! -f "build/bench_pages_${DOCS}/_SUCCESS" ]; then
  BENCH_MASTER="local[8]" BENCH_KG_DOCS="$DOCS" BENCH_KG_ONLY=1 \
    BENCH_KG_REPS=1 SPARK_GRAFT_SF_DIR="$SF_DIR" python bench.py \
    >/dev/null 2>&1 || true
fi

echo "service (masters+drivers): cpus ${SVC}" >&2
echo "narrow: ${N1} exec @cpus ${narrow_lo}-${narrow_hi} (port 7077)" >&2
echo "wide:   ${N2} exec @cpus ${wide_lo}-${hi} (port 7087)" >&2
start_cluster 7077 "$narrow_lo" "$narrow_hi" narrow
start_cluster 7087 "$wide_lo" "$hi" wide

for p in $(seq 1 "$PAIRS"); do
  echo "pair $p" >&2
  run_side 7087 "$N2" "${wide_lo}-${hi}" "$p" "$R2" wide &
  wpid=$!
  run_side 7077 "$N1" "${narrow_lo}-${narrow_hi}" "$p" "$R1" narrow &
  npid=$!
  wait "$wpid" "$npid"
done

N1="$N1" N2="$N2" PAIRS="$PAIRS" DOCS="$DOCS" python3 - <<'EOF'
import json, os

n1, n2 = int(os.environ["N1"]), int(os.environ["N2"])
pairs_n = int(os.environ["PAIRS"])

pairs = {}
for p in range(1, pairs_n + 1):
    try:
        a = json.load(open(f"BENCH/cluster_narrow_p{p}.json"))
        b = json.load(open(f"BENCH/cluster_wide_p{p}.json"))
    except FileNotFoundError:
        continue
    lo = max(a["t_start"], b["t_start"])
    hi = min(a["t_end"], b["t_end"])
    ov = max(0.0, hi - lo) / max(1e-9, a["t_end"] - a["t_start"])
    t1, t2 = a["kg"]["triples_per_sec"], b["kg"]["triples_per_sec"]
    row = {
        "tps_narrow": t1,
        "tps_wide": t2,
        "efficiency": round((t2 / t1) / (n2 / n1), 3),
        "overlap_frac": round(ov, 3),
        "narrow_reps": a["kg"].get("rep_secs"),
        "wide_reps": b["kg"].get("rep_secs"),
    }
    # steady-state variant: best of each side's LAST HALF of builds
    # — symmetric warm-up exclusion in *fraction* of builds, so the
    # wide side's extra JIT passes (it runs N2/N1 x as many builds)
    # can't manufacture superlinear "scaling"
    ra, rb = a["kg"].get("rep_secs") or [], b["kg"].get("rep_secs") or []
    if len(ra) >= 2 and len(rb) >= 2:
        sa = a["kg"]["triples"] / min(ra[len(ra) // 2:])
        sb = b["kg"]["triples"] / min(rb[len(rb) // 2:])
        row["steady_tps_narrow"] = round(sa, 1)
        row["steady_tps_wide"] = round(sb, 1)
        row["steady_efficiency"] = round((sb / sa) / (n2 / n1), 3)
    asp, bsp = a["kg"].get("rep_spans"), b["kg"].get("rep_spans")
    if asp and bsp:
        nlo, nhi = asp[0][0], asp[-1][1]
        inside = [(e - s) for s, e in bsp if s >= nlo and e <= nhi]
        if inside:
            n_tr = b["kg"]["triples"]
            sw = n_tr / min(inside)
            sn = n_tr / min(e - s for s, e in asp)
            row["strict_same_window_eff"] = round((sw / sn) / (n2 / n1), 3)
    pairs[p] = row

effs = sorted(
    x.get("steady_efficiency", x["efficiency"]) for x in pairs.values()
)
median = effs[len(effs) // 2]
out = {
    "protocol": (
        f"REAL standalone clusters: {n1} and {n2} single-core executor "
        f"JVMs (own master+workers each, spark-submit --py-files driver), "
        f"run SIMULTANEOUSLY on disjoint pinned CPU sets, x{len(pairs)} "
        f"pairs, best warm build per side per pair"
    ),
    "kg_docs": int(os.environ["DOCS"]),
    "executors": {"narrow": n1, "wide": n2},
    "pairs": pairs,
    "median_efficiency": median,
    "min_efficiency": effs[0] if effs else None,
    "scaling_efficiency": median,
    "target": 0.8,
    "pass": median >= 0.8,
}
json.dump(out, open("BENCH/cluster_sync.json", "w"), indent=1)
print(json.dumps(out, indent=1))
EOF
