#!/bin/bash
# Round-4 chip queue, part 2 (v2): after chain 1 (TGV + Ghia), run TWO
# NiLES seeds at the stronger spectrum weight 0.2 (seed-0's w=0.05
# improved eval_tke_err 3.61 -> 2.97 but still lost to the 2.58 baseline
# and lost tke@16), then the latent-SDE/KL run, then the dense-kernel A/B
# and a bench cache warm.
set -u
cd /root/repo
LOG_DIR=experiments/logs_r4

echo "[chain2] waiting for chain 1 (ghia rc marker)..."
while ! grep -q '^rc=' "$LOG_DIR/ghia.log" 2>/dev/null; do sleep 60; done

for SEED in 1 2; do
  echo "[chain2] seed-$SEED w=0.2 run"
  timeout 7200 python -u experiments/niles_convergence.py \
    --regime ref20k --steps 1500 --kl_zero --spectrum_weight 0.2 \
    --seed $SEED --suffix _spec_s$SEED > $LOG_DIR/ref20k_spec_s$SEED.log 2>&1
  echo "rc=$?" >> $LOG_DIR/ref20k_spec_s$SEED.log
  tail -2 $LOG_DIR/ref20k_spec_s$SEED.log
done

echo "[chain2] latent-SDE/KL convergence run"
timeout 5400 python -u experiments/niles_convergence.py \
  --regime ref20k --steps 1000 --workdir /tmp/niles_ref20k_sde \
  --dataset_dir /tmp/niles_convergence_ref20k/data \
  --suffix _sde > $LOG_DIR/ref20k_sde.log 2>&1
echo "rc=$?" >> $LOG_DIR/ref20k_sde.log
tail -2 $LOG_DIR/ref20k_sde.log

echo "[chain2] dense 3D kernel A/B"
timeout 1500 python -u experiments/bench_dense3d.py \
  > $LOG_DIR/dense3d.log 2>&1
echo "rc=$?" >> $LOG_DIR/dense3d.log
tail -5 $LOG_DIR/dense3d.log

echo "[chain2] bench cache warm"
GRAFT_BENCH_BUDGET=560 timeout 600 python -u bench.py \
  > $LOG_DIR/bench_warm.log 2>&1
echo "rc=$?" >> $LOG_DIR/bench_warm.log
tail -1 $LOG_DIR/bench_warm.log
echo "[chain2] done"
