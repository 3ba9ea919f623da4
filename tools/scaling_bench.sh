#!/bin/bash
# Two-cluster-size scaling protocol (BASELINE.md §3): identical KG
# job at N and 4N cores via spark-submit --py-files; efficiency =
# (thr_4N / thr_N) / 4.
#
# Each run is taskset-pinned to exactly N CPUs so "cluster size N"
# is physically true (an unpinned local[N] consumes well over N
# cores in JVM/Python side threads).  The host is a shared VM whose
# effective capacity drifts (calibrated per-rep, recorded in
# sidecars), so runs are interleaved N,4N,N,4N,… with best-of-R per
# config.  Results -> BENCH/scaling.json + BENCH/BASELINE.md.
set -euo pipefail
cd "$(dirname "$0")/.."

DOCS="${BENCH_KG_DOCS:-100000}"
SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
N1="${SCALE_N1:-4}"
N2="${SCALE_N2:-16}"
REPS="${SCALE_REPS:-3}"
mkdir -p BENCH build
rm -f build/engine.zip
(zip -qr build/engine.zip ferenda_spark -x '*__pycache__*')

# host capacity calibration: effective parallel units right now
python3 - > BENCH/host_calibration.json <<'EOF'
import json, time, multiprocessing as mp
def burn(_):
    t0 = time.time(); x = 0
    for i in range(10_000_000): x += i * i
    return time.time() - t0
base = burn(0)
out = {"single_task_sec": round(base, 3)}
for procs in (4, 8, 16, 32):
    t0 = time.time()
    with mp.Pool(procs) as p:
        p.map(burn, range(procs))
    wall = time.time() - t0
    out[f"effective_units_at_{procs}"] = round(procs * base / wall, 1)
print(json.dumps(out))
EOF
cat BENCH/host_calibration.json >&2

calib() { # $1 = cores -> effective units right now
  python3 - "$1" <<'PYEOF'
import sys, time, multiprocessing as mp
def burn(_):
    t0 = time.time(); x = 0
    for i in range(10_000_000): x += i * i
    return time.time() - t0
n = int(sys.argv[1]); base = burn(0)
t0 = time.time()
with mp.Pool(n) as p: p.map(burn, range(n))
print(round(n * base / (time.time() - t0), 2))
PYEOF
}

run() { # $1 = cores, $2 = rep
  # taskset pins the WHOLE process tree (JVM + python workers +
  # shuffle threads) to exactly $1 CPUs — an unpinned local[N]
  # consumes well over N cores, which silently inflates the small
  # config and deflates measured scaling. Pinning makes "cluster
  # size N" physically true, like a real N-core executor.
  local units_before units_after cpus
  # pin to the TOP of the cpu range: cpu0 takes interrupts and
  # unpinned external load tends to land low — the small config
  # would otherwise pay disproportionate interference
  local hi=$(( $(nproc) - 1 ))
  cpus="$((hi - $1 + 1))-$hi"
  units_before=$(calib "$1")
  BENCH_MASTER="local[$1]" SPARK_SHUFFLE_PARTITIONS="$1" \
  BENCH_KG_DOCS="$DOCS" SPARK_GRAFT_SF_DIR="$SF_DIR" BENCH_KG_ONLY=1 BENCH_KG_REPS="${SCALE_KG_REPS:-1}" \
  taskset -c "$cpus" spark-submit --master "local[$1]" --driver-memory 48g \
    --py-files build/engine.zip \
    bench.py 2>"BENCH/bench_local$1_r$2.log" | tail -1 \
    > "BENCH/bench_local$1_r$2.json"
  units_after=$(calib "$1")
  python3 - "$1" "$2" "$units_before" "$units_after" <<'PYEOF'
import json, sys
n, r, ub, ua = sys.argv[1:]
f = f"BENCH/bench_local{n}_r{r}.json"
d = json.load(open(f))
d["effective_units_before"] = float(ub)
d["effective_units_after"] = float(ua)
json.dump(d, open(f, "w"))
print(f"local[{n}] rep{r}: {d['kg']['triples_per_sec']} t/s "
      f"(host units {ub}->{ua})", file=sys.stderr)
PYEOF
}

# modes: no arg = full protocol; "one N R" = single rep (lets an
# external driver sequence reps under its own per-command timeout);
# "finish" = aggregation only
MODE="${1:-all}"
if [ "$MODE" = "one" ]; then
  run "$2" "$3"
  exit 0
fi
if [ "$MODE" = "all" ]; then
  for r in $(seq 1 "$REPS"); do
    run "$N1" "$r"
    run "$N2" "$r"
  done
fi

N1="$N1" N2="$N2" REPS="$REPS" python3 - <<'EOF'
import glob
import json
import os

n1, n2, reps = os.environ["N1"], os.environ["N2"], int(os.environ["REPS"])

def best(n):
    runs = [json.load(open(f)) for f in glob.glob(f"BENCH/bench_local{n}_r*.json")]
    bestr = max(runs, key=lambda r: r["kg"]["triples_per_sec"])
    return bestr, [r["kg"]["triples_per_sec"] for r in runs]

b1, all1 = best(n1)
b2, all2 = best(n2)

def calib_ctx(n):
    out = []
    for f in sorted(glob.glob(f"BENCH/bench_local{n}_r*.json")):
        d = json.load(open(f))
        out.append({"t_per_s": d["kg"]["triples_per_sec"],
                    "units_before": d.get("effective_units_before"),
                    "units_after": d.get("effective_units_after")})
    return out
t1, t2 = b1["kg"]["triples_per_sec"], b2["kg"]["triples_per_sec"]
eff = (t2 / t1) / (int(n2) / int(n1))
calib = json.load(open("BENCH/host_calibration.json"))
out = {
    "protocol": f"identical job+input, local[{n1}] vs local[{n2}] (N vs 4N), "
                f"interleaved x{reps}, best-of per config (BASELINE.md §3)",
    "host_calibration": calib,
    "kg_docs": b1["kg"]["docs"],
    "kg_triples": b1["kg"]["triples"],
    f"triples_per_sec_local{n1}": t1,
    f"triples_per_sec_local{n2}": t2,
    f"all_runs_local{n1}": all1,
    f"all_runs_local{n2}": all2,
    f"rep_context_local{n1}": calib_ctx(n1),
    f"rep_context_local{n2}": calib_ctx(n2),
    f"docs_per_sec_local{n1}": b1["kg"]["docs_per_sec"],
    f"docs_per_sec_local{n2}": b2["kg"]["docs_per_sec"],
    "scaling_efficiency": round(eff, 3),
    "target": 0.8,
    "pass": eff >= 0.8,
}
json.dump(out, open("BENCH/scaling.json", "w"), indent=1)
print(json.dumps(out, indent=1))

md = f"""# BENCH — measured results

Protocol: BASELINE.md §3 — identical job (`spark-submit --master
local[N] --driver-memory 48g --py-files build/engine.zip bench.py`),
identical input (deterministic synthetic pages, seed=42,
{b1['kg']['docs']} docs), N ∈ {{{n1}, {n2}}} (N vs 4N), interleaved
×{reps}, best-of per config.

Each run is `taskset`-pinned to exactly N CPUs, so "cluster size N"
is physically true — unpinned `local[N]` consumes well over N cores
in JVM + Python-worker side threads, which silently inflates the
small config. The host is a shared VM (32 vCPUs advertised,
~{calib.get('effective_units_at_32', '?')} effective units sustained
under neighbor steal; full calibration in
`BENCH/host_calibration.json`), so the N→4N pair is {n1}→{n2} — both
inside genuine capacity — runs are interleaved with best-of-{reps}
per config, and every rep carries a before/after capacity sidecar
(`rep_context` in `BENCH/scaling.json`).

## KG construction throughput (pages → materialized triples)

| master | docs/sec | triples/sec | all reps (triples/sec) |
|---|---|---|---|
| local[{n1}]  | {b1['kg']['docs_per_sec']} | {t1} | {all1} |
| local[{n2}] | {b2['kg']['docs_per_sec']} | {t2} | {all2} |

**Scaling efficiency (N→4N): {out['scaling_efficiency']}** (target ≥ 0.8 → {'PASS' if out['pass'] else 'FAIL'})

Total triples: {b1['kg']['triples']} (identical at both sizes — same
input, same code, deterministic output).

Headline per-query timings: `BENCH/headline.json`
(`python bench.py` at local[32], sf0.1).
Raw JSON: `BENCH/bench_local*_r*.json`, `BENCH/scaling.json`.
"""
open("BENCH/BASELINE.md", "w").write(md)
EOF
