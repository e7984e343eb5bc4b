#!/bin/bash
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
R=Results/r4
run() {
  name=$1; t=$2; shift 2
  echo "=== $name start $(date +%T) ===" >> $R/queue6.status
  timeout "$t" "$@" > "$R/$name.log" 2>&1
  echo "=== $name rc=$? $(date +%T) ===" >> $R/queue6.status
  sleep 20
}
run bench_bf16 3600 python -u bench.py
echo "=== QUEUE6 DONE $(date +%T) ===" >> $R/queue6.status
