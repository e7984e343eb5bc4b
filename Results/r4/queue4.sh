#!/bin/bash
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
R=Results/r4
run() {
  name=$1; t=$2; shift 2
  echo "=== $name start $(date +%T) ===" >> $R/queue4.status
  timeout "$t" "$@" > "$R/$name.log" 2>&1
  echo "=== $name rc=$? $(date +%T) ===" >> $R/queue4.status
  sleep 20
}
run sage_infer 3600 python -u benchmark/sampled_sage_scale.py --skip-sampled --infer-iters 20 --fullbatch-epochs 0
run fullbatch_check3 5400 python -u benchmark/fullbatch_plan_check.py
echo "=== QUEUE4 DONE $(date +%T) ===" >> $R/queue4.status
