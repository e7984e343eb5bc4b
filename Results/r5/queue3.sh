#!/bin/bash
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
R=Results/r5
run() { name=$1; t=$2; shift 2
  echo "=== $name start $(date +%T) ===" >> $R/queue3.status
  timeout "$t" "$@" > "$R/$name.log" 2>&1
  echo "=== $name rc=$? $(date +%T) ===" >> $R/queue3.status
}
run qr_eq2_ex18 1800 python -u benchmark/qr_bench.py --ordering best --matrices ex18
run qr_eq2_bayer10 1800 python -u benchmark/qr_bench.py --ordering best --matrices bayer10
run qr_eq2_cvxqp3 1800 python -u benchmark/qr_bench.py --ordering best --matrices cvxqp3
