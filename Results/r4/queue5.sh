#!/bin/bash
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
R=Results/r4
run() {
  name=$1; t=$2; shift 2
  echo "=== $name start $(date +%T) ===" >> $R/queue5.status
  timeout "$t" "$@" > "$R/$name.log" 2>&1
  echo "=== $name rc=$? $(date +%T) ===" >> $R/queue5.status
  sleep 20
}
run sampled_sage_scan6 3600 python -u benchmark/sampled_sage_scale.py --scan --infer-iters 0 --fullbatch-epochs 0
echo "=== QUEUE5 DONE $(date +%T) ===" >> $R/queue5.status
