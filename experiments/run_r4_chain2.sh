#!/bin/bash
# Round-4 chip queue, part 2: waits for chain 1 (TGV + Ghia), then runs
# the NiLES seed-1 spectrum run and the latent-SDE/KL convergence run.
set -u
cd /root/repo
LOG_DIR=experiments/logs_r4

echo "[chain2] waiting for chain 1 (ghia rc marker)..."
while ! grep -q '^rc=' "$LOG_DIR/ghia.log" 2>/dev/null; do sleep 60; done
echo "[chain2] chain 1 done; seed-1 NiLES run"

timeout 9000 python -u experiments/niles_convergence.py \
  --regime ref20k --steps 2000 --kl_zero --spectrum_weight 0.05 \
  --seed 1 --suffix _spec_s1 > $LOG_DIR/ref20k_spec_s1.log 2>&1
echo "rc=$?" >> $LOG_DIR/ref20k_spec_s1.log
tail -2 $LOG_DIR/ref20k_spec_s1.log

echo "[chain2] latent-SDE/KL convergence run"
# Fresh workdir: the default ref20k workdir holds r3 checkpoints whose
# restore would silently skip training.
timeout 7200 python -u experiments/niles_convergence.py \
  --regime ref20k --steps 1400 --workdir /tmp/niles_ref20k_sde \
  --dataset_dir /tmp/niles_convergence_ref20k/data \
  --suffix _sde > $LOG_DIR/ref20k_sde.log 2>&1
echo "rc=$?" >> $LOG_DIR/ref20k_sde.log
tail -2 $LOG_DIR/ref20k_sde.log
echo "[chain2] done"
