#!/bin/bash
# Round-5 NiLES chip chain (VERDICT r4 #1 + #9), strictly serialized.
#
# Revised after the first r5 VM died ~step 100 into item 1 and /tmp was
# wiped: the round-4 orbax checkpoints (/tmp/niles_ref20k_sde, flagship
# seed 1/2 workdirs) no longer exist, so the resume (old item 2) and the
# eval-only passes (old items 4/5) are impossible.  What remains:
#
# 1. Composed reference-default config: LatentSDE + KL ramp +
#    spectrum_loss_weight=0.2, 1600 steps, final eval at batch 128.
# 2. Third kl_zero flagship seed (w=0.2, seed 3), 1500 steps, batch-128 eval.
set -u
cd /root/repo
LOG=experiments/logs_r5
mkdir -p $LOG

probe() {
  for i in 1 2 3; do
    timeout 300 python -c "
import jax, time; t0=time.time()
import jax.numpy as jnp
(jnp.ones((256,256))@jnp.ones((256,256))).block_until_ready()
print('probe ok %.1f s' % (time.time()-t0))" && return 0
    echo "[chain] probe attempt $i failed; sleeping 150 s"
    sleep 150
  done
  return 1
}

echo "[chain] 1: composed SDE+spectrum run"
probe
timeout 9000 python experiments/niles_convergence.py --regime ref20k \
  --steps 1600 --spectrum_weight 0.2 --seed 0 --final_eval_batch 128 \
  --suffix _sdespec >> $LOG/sdespec.log 2>&1
echo "[chain] 1 rc=$?"

echo "[chain] 2: third kl_zero flagship seed (w=0.2, seed 3)"
probe
timeout 9000 python experiments/niles_convergence.py --regime ref20k \
  --steps 1500 --kl_zero --spectrum_weight 0.2 --seed 3 \
  --final_eval_batch 128 --suffix _spec_s3 >> $LOG/spec_s3.log 2>&1
echo "[chain] 2 rc=$?"

echo "[chain] NiLES chain done"
touch /tmp/r5_niles_chain_done
