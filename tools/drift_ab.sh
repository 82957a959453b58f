#!/bin/bash
# Root-cause harness for the r10 "uniform ~13% drift": runs the SAME
# bench subset against (A) the driver's regenerated NTZ-timestamp
# fixtures (which also route three tables through Tables.table's
# NTZ->instant cast) and (B) a byte-equivalent copy whose timestamp
# columns are instant-typed, reproducing the r9-era fixture shape (no
# NTZ cast fires). A/B parity => the regeneration + cast contribute
# ~nothing and the residual r9->r10 drift is the box; a gap =>
# fixtures/cast are the cause, sized by the gap. Runs A,B,A,B so an
# environment shift between runs is visible as run1-vs-run2 spread.
#
# Prereq (built by the round-11 session; see PLANS.md):
#   /tmp/graft-ab/sf0.1-instant  + /tmp/graft-ab/sf0.001 (warm dir)
set -eu
cd /root/repo
SUBSET=q01_scan_distinct,q02_watermark_scan,q03_boolean_split,q04_multikey_left_join,q05_normalized_key_join,q06_keep_latest_dedup,q07_conform_project,q08_airline_extract,q09_time_hhmm,q10_duration_minutes,q11_luggage,q12_date_mmdd,q13_transfer_count,q21_token_count,q24_fingerprint,q25_ngram_jaccard,q26_minhash_lsh,q40_flight_pipeline
OUT=${1:-/tmp/drift_ab}
mkdir -p "$OUT"
run() { # $1 = tag, $2 = sf dir, $3 = warm dir
  echo "[drift_ab] $1 (loadavg $(cut -d' ' -f1-3 /proc/loadavg))"
  SPARK_GRAFT_SF_DIR="$2" SPARK_GRAFT_WARM_DIR="$3" \
    SPARK_GRAFT_BENCH_ONLY="$SUBSET" SPARK_GRAFT_CPUS=32 \
    sbt -batch "runMain graft.Bench" > "$OUT/$1.log" 2>&1
  cp bench_out.json "$OUT/$1.json"
}
run a1 /root/testdata/sf0.1 /root/testdata/sf0.001
run b1 /tmp/graft-ab/sf0.1-instant /tmp/graft-ab/sf0.001
run a2 /root/testdata/sf0.1 /root/testdata/sf0.001
run b2 /tmp/graft-ab/sf0.1-instant /tmp/graft-ab/sf0.001
python3 - "$OUT" <<'EOF'
import json, sys, statistics
out = sys.argv[1]
runs = {t: json.load(open(f"{out}/{t}.json")) for t in ("a1","b1","a2","b2")}
qs = sorted(runs["a1"]["queries"])
print(f"{'query':34s} {'A(ntz)':>8s} {'B(inst)':>8s} {'B/A':>6s}  A=[a1,a2] B=[b1,b2]")
ta = tb = 0.0
for q in qs:
    a = [runs["a1"]["queries"][q], runs["a2"]["queries"][q]]
    b = [runs["b1"]["queries"][q], runs["b2"]["queries"][q]]
    ma, mb = statistics.median(a), statistics.median(b)
    ta += ma; tb += mb
    print(f"{q:34s} {ma:8.3f} {mb:8.3f} {mb/ma:6.2f}  {[round(x,3) for x in a]} {[round(x,3) for x in b]}")
print(f"{'TOTAL':34s} {ta:8.3f} {tb:8.3f} {tb/ta:6.2f}")
for t, r in runs.items():
    print(f"{t}: loadavg={r['loadavg']:.2f} noisy={r['noisy']}")
EOF
