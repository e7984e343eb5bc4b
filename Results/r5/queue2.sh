#!/bin/bash
# Round-5 queue 2: clean final-evidence runs on a quiet machine.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
R=Results/r5

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

run() { # run <name> <timeout_s> <cmd...>
  name=$1; t=$2; shift 2
  echo "=== $name start $(date +%T) ===" >> $R/queue2.status
  timeout "$t" "$@" > "$R/$name.log" 2>&1
  echo "=== $name rc=$? $(date +%T) ===" >> $R/queue2.status
  wait_tunnel
  echo "=== tunnel rc=$? $(date +%T) ===" >> $R/queue2.status
}

# equilibrated sweep, one process per matrix (a worker crash on one must
# not poison the rest)
for m in bayer10 bcsstk14 cvxqp3 dwt_992 epb1 ex18 lns_3937 reorientation_8 t2d_q9; do
  run qr_eq_$m 1800 python -u benchmark/qr_bench.py --ordering best --matrices $m
done
run bench_final 2400 python -u bench.py
run qr_eq2_ex18 1800 python -u benchmark/qr_bench.py --ordering best --matrices ex18
run qr_eq2_bayer10 1800 python -u benchmark/qr_bench.py --ordering best --matrices bayer10
run qr_eq2_cvxqp3 1800 python -u benchmark/qr_bench.py --ordering best --matrices cvxqp3
