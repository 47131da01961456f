#!/bin/bash
# Round-4 chip queue, part 4 (replaces chain3 after the seed-1 stall):
# maxiter-capped trainer; seed-1 + seed-2 at w=0.2, short SDE/KL run,
# solo dense/pair kernel A/B, bench cache warm.
set -u
cd /root/repo
LOG_DIR=experiments/logs_r4

for SEED in 1 2; do
  echo "[chain4] seed-$SEED w=0.2 run"
  timeout 6600 python -u experiments/niles_convergence.py \
    --regime ref20k --steps 1500 --kl_zero --spectrum_weight 0.2 \
    --seed $SEED --suffix _spec_s$SEED > $LOG_DIR/ref20k_spec_s$SEED.log 2>&1
  echo "rc=$?" >> $LOG_DIR/ref20k_spec_s$SEED.log
  tail -2 $LOG_DIR/ref20k_spec_s$SEED.log
done

echo "[chain4] latent-SDE/KL convergence run"
timeout 4200 python -u experiments/niles_convergence.py \
  --regime ref20k --steps 800 --workdir /tmp/niles_ref20k_sde \
  --dataset_dir /tmp/niles_convergence_ref20k/data \
  --suffix _sde > $LOG_DIR/ref20k_sde.log 2>&1
echo "rc=$?" >> $LOG_DIR/ref20k_sde.log
tail -2 $LOG_DIR/ref20k_sde.log

echo "[chain4] dense/pair 3D kernel A/B (solo)"
timeout 1500 python -u experiments/bench_dense3d.py \
  > $LOG_DIR/dense3d_solo.log 2>&1
echo "rc=$?" >> $LOG_DIR/dense3d_solo.log
grep -v WARNING $LOG_DIR/dense3d_solo.log | tail -5

echo "[chain4] bench cache warm"
GRAFT_BENCH_BUDGET=560 timeout 600 python -u bench.py \
  > $LOG_DIR/bench_warm.log 2>&1
echo "rc=$?" >> $LOG_DIR/bench_warm.log
tail -1 $LOG_DIR/bench_warm.log
echo "[chain4] done"
