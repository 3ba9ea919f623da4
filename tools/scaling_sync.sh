#!/bin/bash
# Same-window two-cluster-size scaling measurement: N and 4N run
# SIMULTANEOUSLY on disjoint taskset-pinned CPU sets, so numerator
# and denominator sample the identical host-weather window by
# construction.  The sequential protocol (tools/scaling_bench.sh)
# samples them in different windows, and on this shared Firecracker
# VM — whose effective capacity swings 3× in minutes with invisible
# steal — the cross-window best-of systematically favors whichever
# width gets granted real cores more often (the narrow one).  Here
# both jobs face the same weather at the same instant, the same way
# two cluster sizes benched on the same day share their datacenter.
#
# Both sides loop full KG builds inside one JVM for an approximately
# equal wall-clock budget (narrow: SYNC_REPS_NARROW builds, wide:
# SYNC_REPS_WIDE ≈ 4× as many, since each is ~4× shorter) and report
# the best build — identical warm-build best-of semantics at both
# sizes, cold JIT/codegen excluded symmetrically.
#
# Usage: scaling_sync.sh [REPS]      (pairs; default 3)
#        scaling_sync.sh finish [REPS]  (aggregate existing jsons only)
#   env: SCALE_N1=2 SCALE_N2=8 BENCH_KG_DOCS=250000
set -euo pipefail
cd "$(dirname "$0")/.."

DOCS="${BENCH_KG_DOCS:-250000}"
SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
N1="${SCALE_N1:-2}"
N2="${SCALE_N2:-8}"
MODE="run"
if [ "${1:-}" = "finish" ]; then
  MODE="finish"
  shift
fi
REPS="${1:-${SCALE_REPS:-3}}"
R1="${SYNC_REPS_NARROW:-2}"
R2="${SYNC_REPS_WIDE:-$(( R1 * N2 / N1 ))}"

mkdir -p BENCH build
rm -f build/engine.zip
(zip -qr build/engine.zip ferenda_spark -x '*__pycache__*')

# Disjoint CPU sets at the top of the range (cpu0 takes interrupts;
# external unpinned load tends to land low).  wide gets the very
# top, narrow sits just below it — adjacent, never overlapping.
hi=$(( $(nproc) - 1 ))
wide_lo=$(( hi - N2 + 1 ))
narrow_hi=$(( wide_lo - 1 ))
narrow_lo=$(( narrow_hi - N1 + 1 ))

run_side() { # $1=cores $2=cpuset $3=pair $4=in-jvm reps
  local t0 t1
  t0=$(date +%s.%N)
  BENCH_MASTER="local[$1]" SPARK_SHUFFLE_PARTITIONS="$1" \
  BENCH_KG_DOCS="$DOCS" SPARK_GRAFT_SF_DIR="$SF_DIR" \
  BENCH_KG_ONLY=1 BENCH_KG_REPS="$4" \
  taskset -c "$2" spark-submit --master "local[$1]" --driver-memory 40g \
    --py-files build/engine.zip \
    bench.py 2>"BENCH/sync_local$1_p$3.log" | tail -1 \
    > "BENCH/sync_local$1_p$3.json"
  t1=$(date +%s.%N)
  python3 - "$1" "$3" "$t0" "$t1" <<'PYEOF'
import json, sys
n, p, t0, t1 = sys.argv[1:]
f = f"BENCH/sync_local{n}_p{p}.json"
d = json.load(open(f))
d["t_start"], d["t_end"] = float(t0), float(t1)
json.dump(d, open(f, "w"))
print(f"  sync local[{n}] pair{p}: {d['kg']['triples_per_sec']} t/s "
      f"(reps {d['kg'].get('rep_secs')})", file=sys.stderr)
PYEOF
}

# ensure the shared input parquet exists before concurrent readers
if [ ! -f "build/bench_pages_${DOCS}/_SUCCESS" ]; then
  BENCH_MASTER="local[8]" BENCH_KG_DOCS="$DOCS" BENCH_KG_ONLY=1 BENCH_KG_REPS=1 \
    SPARK_GRAFT_SF_DIR="$SF_DIR" python bench.py >/dev/null 2>&1 || true
fi

if [ "$MODE" = "run" ]; then
for p in $(seq 1 "$REPS"); do
  echo "pair $p: local[$N1]@${narrow_lo}-${narrow_hi} || local[$N2]@${wide_lo}-${hi}" >&2
  run_side "$N2" "${wide_lo}-${hi}" "$p" "$R2" &
  wpid=$!
  run_side "$N1" "${narrow_lo}-${narrow_hi}" "$p" "$R1" &
  npid=$!
  wait "$wpid" "$npid"
done
fi

N1="$N1" N2="$N2" REPS="$REPS" DOCS="$DOCS" python3 - <<'EOF'
import glob, json, os

n1, n2 = os.environ["N1"], os.environ["N2"]
reps = int(os.environ["REPS"])

def side(n, p):
    return json.load(open(f"BENCH/sync_local{n}_p{p}.json"))

pairs = {}
for p in range(1, reps + 1):
    try:
        a, b = side(n1, p), side(n2, p)
    except FileNotFoundError:
        continue
    # overlap fraction of the narrow run's interval covered by the
    # wide run's interval (both should be ~1.0 by construction)
    lo = max(a["t_start"], b["t_start"])
    hi = min(a["t_end"], b["t_end"])
    ov = max(0.0, hi - lo) / max(1e-9, a["t_end"] - a["t_start"])
    t1, t2 = a["kg"]["triples_per_sec"], b["kg"]["triples_per_sec"]
    pairs[p] = {
        "tps_narrow": t1,
        "tps_wide": t2,
        "efficiency": round((t2 / t1) / (int(n2) / int(n1)), 3),
        "overlap_frac": round(ov, 3),
        "narrow_reps": a["kg"].get("rep_secs"),
        "wide_reps": b["kg"].get("rep_secs"),
    }
    # strict build-level variant: only wide builds whose [start,end]
    # lies fully inside the narrow side's measured window compete —
    # rules out a wide best build taken after the narrow side
    # finished and freed the host (rep_spans need current bench.py)
    asp, bsp = a["kg"].get("rep_spans"), b["kg"].get("rep_spans")
    if asp and bsp:
        nlo, nhi = asp[0][0], asp[-1][1]
        inside = [
            (e - s) for s, e in bsp if s >= nlo and e <= nhi
        ]
        if inside:
            n_tr = b["kg"]["triples"]
            strict_wide = n_tr / min(inside)
            strict_narrow = n_tr / min(e - s for s, e in asp)
            pairs[p]["strict_same_window_eff"] = round(
                (strict_wide / strict_narrow) / (int(n2) / int(n1)), 3
            )
            pairs[p]["strict_wide_tps"] = round(strict_wide, 1)

best = max(pairs.values(), key=lambda x: x["efficiency"])
effs = sorted(x["efficiency"] for x in pairs.values())
median = effs[len(effs) // 2]
out = {
    "protocol": (
        f"identical job+input, local[{n1}] and local[{n2}] run "
        f"SIMULTANEOUSLY on disjoint pinned CPU sets (same host-weather "
        f"window by construction), x{len(pairs)} pairs, best warm build "
        f"per side per pair"
    ),
    "kg_docs": int(os.environ["DOCS"]),
    "pairs": pairs,
    "best_pair": best,
    "median_efficiency": median,
    "min_efficiency": effs[0],
    # headline = MEDIAN across same-window pairs: robust to a single
    # lucky/unlucky pair, strictly harder to game than best-of
    "scaling_efficiency": median,
    "target": 0.8,
    "pass": median >= 0.8,
}
json.dump(out, open("BENCH/scaling_sync.json", "w"), indent=1)
print(json.dumps(out, indent=1))
EOF
