#!/bin/bash
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
R=Results/r4
wait_tunnel() {
  for i in $(seq 1 10); do
    timeout 115 python -u -c "
import jax, jax.numpy as jnp
print(float((jnp.ones((256,256))@jnp.ones((256,256))).sum()))" \
      >/dev/null 2>&1 && return 0
    sleep 60
  done
  return 1
}
run() {
  name=$1; t=$2; shift 2
  echo "=== $name start $(date +%T) ===" >> $R/queue2.status
  timeout "$t" "$@" > "$R/$name.log" 2>&1
  echo "=== $name rc=$? $(date +%T) ===" >> $R/queue2.status
  wait_tunnel
  echo "=== tunnel rc=$? $(date +%T) ===" >> $R/queue2.status
}
run sampled_sage_scan3 3600 python -u benchmark/sampled_sage_scale.py --scan --infer-iters 0 --fullbatch-epochs 0
run sampled_sage_perbatch 3600 python -u benchmark/sampled_sage_scale.py --infer-iters 0 --fullbatch-epochs 0
echo "=== QUEUE2 BASE DONE $(date +%T) ===" >> $R/queue2.status
run sampled_sage_scan4 3600 python -u benchmark/sampled_sage_scale.py --scan --infer-iters 0 --fullbatch-epochs 0
echo "=== QUEUE2 SCAN4 DONE $(date +%T) ===" >> $R/queue2.status
run sampled_sage_scan5 3600 python -u benchmark/sampled_sage_scale.py --scan --infer-iters 20 --fullbatch-epochs 0
run fullbatch_check2 5400 python -u benchmark/fullbatch_plan_check.py
echo "=== QUEUE2 SYNC DONE $(date +%T) ===" >> $R/queue2.status
