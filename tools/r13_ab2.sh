#!/bin/bash
# r13 materialization A/Bs at local[32]: dsir, LWW (l1 + ETL), hybrid leg.
set -u
cd /root/repo
run() {  # run <label> <query_env...>
  local label=$1; shift
  out=$(env SPARK_GRAFT_CPUS=32 "$@" python bench.py 2>/dev/null | tail -1)
  echo "$label $out"
}
for r in 1 2 3; do
  run "r=$r dsir_mat"  SPARK_GRAFT_BENCH_SKIP_ETL=1 SPARK_GRAFT_BENCH_ONLY=l5_dsir_weights
  run "r=$r dsir_lazy" SPARK_GRAFT_BENCH_SKIP_ETL=1 SPARK_GRAFT_BENCH_ONLY=l5_dsir_weights R13_DSIR_LAZY=1
  run "r=$r l1_mat"    SPARK_GRAFT_BENCH_SKIP_ETL=1 SPARK_GRAFT_BENCH_ONLY=l1_dedup_last_write_wins R13_LWW_FORCE=mat
  run "r=$r l1_auto"   SPARK_GRAFT_BENCH_SKIP_ETL=1 SPARK_GRAFT_BENCH_ONLY=l1_dedup_last_write_wins
done
for r in 1 2; do
  run "r=$r etl_auto"  SPARK_GRAFT_BENCH_ETL_ONLY=1
  run "r=$r etl_lazy"  SPARK_GRAFT_BENCH_ETL_ONLY=1 R13_LWW_FORCE=lazy
  run "r=$r hyb_collect" SPARK_GRAFT_BENCH_SKIP_ETL=1 SPARK_GRAFT_BENCH_ONLY=l4_linear_retriever,l4_rrf_hybrid_topk R13_HYB=collect
  run "r=$r hyb_ckpt"    SPARK_GRAFT_BENCH_SKIP_ETL=1 SPARK_GRAFT_BENCH_ONLY=l4_linear_retriever,l4_rrf_hybrid_topk R13_HYB=ckpt
  run "r=$r hyb_lazy"    SPARK_GRAFT_BENCH_SKIP_ETL=1 SPARK_GRAFT_BENCH_ONLY=l4_linear_retriever,l4_rrf_hybrid_topk R13_HYB=lazy
done
echo ALLDONE
