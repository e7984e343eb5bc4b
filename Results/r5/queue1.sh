#!/bin/bash
# Round-5 evidence queue (serialized: one TPU client at a time).
# Each step logs to Results/r5/ and failures do not stop the queue.
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
  echo "=== $name start $(date +%T) ===" >> $R/queue1.status
  timeout "$t" "$@" > "$R/$name.log" 2>&1
  echo "=== $name rc=$? $(date +%T) ===" >> $R/queue1.status
  wait_tunnel
  echo "=== tunnel rc=$? $(date +%T) ===" >> $R/queue1.status
}

run fullbatch_check 3600 python -u benchmark/fullbatch_plan_check.py
run qr_bench_best 3600 python -u benchmark/qr_bench.py --ordering best
for s in 0 1 2 3 4; do
  run soft_s$s 3600 python -u scripts/train_sharded.py \
      --loss soft --ema 0.995 --readout meanmax --seed $s \
      --ckpt-dir models_ckpt/soft_s$s \
      --out models_ckpt/graphmodel_soft_s$s.msgpack
  run soft_eval${s}_test 1800 python -u scripts/eval_fill.py \
      --ckpt models_ckpt/graphmodel_soft_s$s.msgpack --readout meanmax --split 2
  run soft_eval${s}_val 1800 python -u scripts/eval_fill.py \
      --ckpt models_ckpt/graphmodel_soft_s$s.msgpack --readout meanmax --split 1
done
run sampled_scan_f32 2400 python -u benchmark/sampled_sage_scale.py --scan --epochs 3 --infer-iters 0 --fullbatch-epochs 0
run sampled_scan_bf16 2400 python -u benchmark/sampled_sage_scale.py --scan --epochs 3 --infer-iters 0 --fullbatch-epochs 0 --feat-dtype bf16
run eval_time_meas68 10800 python -u scripts/eval_time.py --measure 68
run qr_bench_best_eq 3600 python -u benchmark/qr_bench.py --ordering best
run sampled_scan_f32_b 2400 python -u benchmark/sampled_sage_scale.py --scan --epochs 3 --infer-iters 0 --fullbatch-epochs 0
run sampled_scan_bf16_b 2400 python -u benchmark/sampled_sage_scale.py --scan --epochs 3 --infer-iters 0 --fullbatch-epochs 0 --feat-dtype bf16
run qr_bench_best_eq2 3600 python -u benchmark/qr_bench.py --ordering best
for s in 0 1 2 3 4; do
  run solver_s$s 3600 python -u scripts/train_sharded.py \
      --loss regret --ema 0.995 --readout meanmax --seed $s \
      --data-root data/ClassorderGenS --matrices-dir data/ClassorderGen/matrices \
      --extra-train-root data/ClassorderGen2kS,data/ClassorderGen8kS \
      --extra-matrices-dir data/ClassorderGen2k/matrices,data/ClassorderGen8k/matrices \
      --ckpt-dir models_ckpt/solver_s$s \
      --out models_ckpt/graphmodel_solver_s$s.msgpack
done
