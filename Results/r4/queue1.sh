#!/bin/bash
# Round-4 evidence queue (serialized: one TPU client at a time).
# Each step logs to Results/r4/ and failures do not stop the queue.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
R=Results/r4

wait_tunnel() {
  # after any client exits, give the axon tunnel a recovery probe
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

run points_pointnet 3600 python -u benchmark/points.py --model point_net
run points_edgecnn  3600 python -u benchmark/points.py --model edge_cnn
run qr_bench_best   5400 python -u benchmark/qr_bench.py --ordering best
run apples_v3       5400 python -u scripts/graphclass.py --mode scan-mini
run apples_v3_strict 5400 python -u scripts/graphclass.py --mode scan-mini --strict-parity
run cross_domain    3600 python -u scripts/cross_domain_eval.py
for s in 0 1 2 3 4; do
  run flagship_seed$s 3600 python -u scripts/train_sharded.py \
      --loss regret --ema 0.995 --readout meanmax --seed $s \
      --ckpt-dir models_ckpt/sharded_s$s \
      --out models_ckpt/graphmodel_s$s.msgpack
  run flagship_eval${s}_test 1800 python -u scripts/eval_fill.py \
      --ckpt models_ckpt/graphmodel_s$s.msgpack --readout meanmax --split 2
  run flagship_eval${s}_val 1800 python -u scripts/eval_fill.py \
      --ckpt models_ckpt/graphmodel_s$s.msgpack --readout meanmax --split 1
done
run fullbatch_check 5400 python -u benchmark/fullbatch_plan_check.py
run bench_current 3600 python -u bench.py
echo "=== QUEUE DONE $(date +%T) ===" >> $R/queue1.status
run bsr_ab 3600 python -u benchmark/bsr_ab.py
run bench_final 3600 python -u bench.py
echo "=== QUEUE REALLY DONE $(date +%T) ===" >> $R/queue1.status
run qr_bench_best_fixed 5400 python -u benchmark/qr_bench.py --ordering best
echo "=== QUEUE FULLY DONE $(date +%T) ===" >> $R/queue1.status
run apples_v3_redo 5400 python -u scripts/graphclass.py --mode scan-mini --ckpt-dir models_ckpt/ref408_v3
run cross_domain_v3 3600 python -u scripts/cross_domain_eval.py
echo "=== QUEUE V3 DONE $(date +%T) ===" >> $R/queue1.status
run sampled_sage_scan 3600 python -u benchmark/sampled_sage_scale.py --scan --infer-iters 0 --fullbatch-epochs 0
echo "=== QUEUE SCAN DONE $(date +%T) ===" >> $R/queue1.status
run points_edgecnn_fastknn 3600 python -u benchmark/points.py --model edge_cnn --epochs 5
echo "=== QUEUE KNN DONE $(date +%T) ===" >> $R/queue1.status
run bench_fixed 3600 python -u bench.py
run bsr_ab_fixed 3600 python -u benchmark/bsr_ab.py
echo "=== QUEUE BSRFIX DONE $(date +%T) ===" >> $R/queue1.status
run qr_bench_best_r2 5400 python -u benchmark/qr_bench.py --ordering best
echo "=== QUEUE QR2 DONE $(date +%T) ===" >> $R/queue1.status
run sampled_sage_scan2 3600 python -u benchmark/sampled_sage_scale.py --scan --infer-iters 0 --fullbatch-epochs 0
run points_edgecnn_fastknn2 3600 python -u benchmark/points.py --model edge_cnn --epochs 5
echo "=== QUEUE SCAN2 DONE $(date +%T) ===" >> $R/queue1.status
run bench_fixed2 3600 python -u bench.py
run bsr_ab_fixed2 3600 python -u benchmark/bsr_ab.py
echo "=== QUEUE BSRFIX2 DONE $(date +%T) ===" >> $R/queue1.status
run sampled_sage_scan3 3600 python -u benchmark/sampled_sage_scale.py --scan --infer-iters 0 --fullbatch-epochs 0
echo "=== QUEUE SCAN3 DONE $(date +%T) ===" >> $R/queue1.status
