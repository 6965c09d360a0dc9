#!/bin/bash
# Interleaved A/B runner (r13): each variant = fresh bench.py subset run.
# Usage: tools/r13_ab.sh <cpus> <query[,query...]> <rounds> <variant...>
# Variants: head nohint lazy nohint_lazy pargc pargc_nohint ...
set -u
CPUS=$1; Q=$2; ROUNDS=$3; shift 3
cd /root/repo
for r in $(seq 1 "$ROUNDS"); do
  for v in "$@"; do
    env_extra=()
    case "$v" in
      *nohint*) env_extra+=("R13_NOHINT=1") ;;
    esac
    case "$v" in
      *lazy*) env_extra+=("R13_LAZY=1") ;;
    esac
    case "$v" in
      *pargc*) env_extra+=("PYSPARK_SUBMIT_ARGS=--conf spark.driver.extraJavaOptions=-XX:+UseParallelGC pyspark-shell") ;;
    esac
    out=$(env SPARK_GRAFT_CPUS="$CPUS" SPARK_GRAFT_BENCH_SKIP_ETL=1 \
          SPARK_GRAFT_BENCH_ONLY="$Q" "${env_extra[@]}" \
          python bench.py 2>/dev/null | tail -1)
    echo "round=$r cpus=$CPUS variant=$v $out"
  done
done
