#!/bin/bash
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
R=Results/r5
run() { name=$1; t=$2; shift 2
  echo "=== $name start $(date +%T) ===" >> $R/queue4.status
  timeout "$t" "$@" > "$R/$name.log" 2>&1
  echo "=== $name rc=$? $(date +%T) ===" >> $R/queue4.status
}
for s in 5 6 7 8 9; do
  run flagship_seed$s 3600 python -u scripts/train_sharded.py \
      --loss regret --ema 0.995 --readout meanmax --seed $s \
      --ckpt-dir models_ckpt/sharded_s$s \
      --out models_ckpt/graphmodel_s$s.msgpack
done
