#!/bin/bash
# Round-4 chip queue, part 3 (replaces chain2): after Ghia, retry the TGV
# 32^3:7 rung (maxiter-capped CG; smaller-dt fallback), then two NiLES
# seeds at spectrum weight 0.2, the latent-SDE/KL run, the dense-kernel
# A/B, and a bench cache warm.
set -u
cd /root/repo
LOG_DIR=experiments/logs_r4

echo "[chain3] waiting for ghia rc marker..."
while ! grep -q '^rc=' "$LOG_DIR/ghia.log" 2>/dev/null; do sleep 60; done
tail -2 $LOG_DIR/ghia.log

echo "[chain3] TGV 32^3:7 retry (maxiter-capped)"
timeout 3600 python -u experiments/taylor_green_3d_campaign.py \
  --cases 32:7 --t_end 10.5 --alpha 0.05 \
  --out experiments/tgv_32_7.json > $LOG_DIR/tgv32_r2.log 2>&1
rc=$?
echo "rc=$rc" >> $LOG_DIR/tgv32_r2.log
tail -2 $LOG_DIR/tgv32_r2.log
if [ "$rc" != "0" ]; then
  echo "[chain3] TGV retry failed (rc=$rc); smaller-dt fallback"
  timeout 4500 python -u experiments/taylor_green_3d_campaign.py \
    --cases 32:7 --t_end 10.5 --alpha 0.05 --dt 0.002 \
    --out experiments/tgv_32_7.json > $LOG_DIR/tgv32_r3.log 2>&1
  echo "rc=$?" >> $LOG_DIR/tgv32_r3.log
  tail -2 $LOG_DIR/tgv32_r3.log
fi

for SEED in 1 2; do
  echo "[chain3] seed-$SEED w=0.2 run"
  timeout 7200 python -u experiments/niles_convergence.py \
    --regime ref20k --steps 1500 --kl_zero --spectrum_weight 0.2 \
    --seed $SEED --suffix _spec_s$SEED > $LOG_DIR/ref20k_spec_s$SEED.log 2>&1
  echo "rc=$?" >> $LOG_DIR/ref20k_spec_s$SEED.log
  tail -2 $LOG_DIR/ref20k_spec_s$SEED.log
done

echo "[chain3] latent-SDE/KL convergence run"
timeout 5400 python -u experiments/niles_convergence.py \
  --regime ref20k --steps 1000 --workdir /tmp/niles_ref20k_sde \
  --dataset_dir /tmp/niles_convergence_ref20k/data \
  --suffix _sde > $LOG_DIR/ref20k_sde.log 2>&1
echo "rc=$?" >> $LOG_DIR/ref20k_sde.log
tail -2 $LOG_DIR/ref20k_sde.log

echo "[chain3] dense 3D kernel A/B"
timeout 1500 python -u experiments/bench_dense3d.py \
  > $LOG_DIR/dense3d.log 2>&1
echo "rc=$?" >> $LOG_DIR/dense3d.log
tail -5 $LOG_DIR/dense3d.log

echo "[chain3] bench cache warm"
GRAFT_BENCH_BUDGET=560 timeout 600 python -u bench.py \
  > $LOG_DIR/bench_warm.log 2>&1
echo "rc=$?" >> $LOG_DIR/bench_warm.log
tail -1 $LOG_DIR/bench_warm.log
echo "[chain3] done"
