#!/bin/bash
# Round-5 NiLES chip chain (VERDICT r4 #1 + #9), strictly serialized.
#
# 1. Composed reference-default config: LatentSDE + KL ramp +
#    spectrum_loss_weight=0.2, 1600 steps, final eval at batch 128.
# 2. Resume the plain SDE/KL run (/tmp/niles_ref20k_sde, step-800 orbax
#    checkpoint) to 1600 steps, final eval at batch 128.
# 3. Third kl_zero flagship seed (w=0.2, seed 3), 1500 steps, batch-128 eval.
# 4/5. Eval-only batch-128 passes on the round-4 flagship checkpoints
#    (seeds 1 and 2): --steps equal to their trained step count skips
#    training and runs only the final-checkpoint eval.
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
timeout 7200 python experiments/niles_convergence.py --regime ref20k \
  --steps 1600 --spectrum_weight 0.2 --seed 0 --final_eval_batch 128 \
  --suffix _sdespec >> $LOG/sdespec.log 2>&1
echo "[chain] 1 rc=$?"

echo "[chain] 2: resume plain SDE to 1600"
probe
timeout 5400 python experiments/niles_convergence.py --regime ref20k \
  --steps 1600 --workdir /tmp/niles_ref20k_sde --final_eval_batch 128 \
  --suffix _sde >> $LOG/sde_resume.log 2>&1
echo "[chain] 2 rc=$?"

echo "[chain] 3: third kl_zero flagship seed (w=0.2, seed 3)"
probe
timeout 7200 python experiments/niles_convergence.py --regime ref20k \
  --steps 1500 --kl_zero --spectrum_weight 0.2 --seed 3 \
  --final_eval_batch 128 --suffix _spec_s3 >> $LOG/spec_s3.log 2>&1
echo "[chain] 3 rc=$?"

# Eval-only: explicit workdir (seed/w left at defaults so the script does
# NOT re-suffix it), fresh result filename so round-4 artifacts survive.
for s in 1 2; do
  echo "[chain] 4/5: batch-128 eval on flagship seed $s"
  probe
  timeout 2400 python experiments/niles_convergence.py --regime ref20k \
    --steps 1500 --kl_zero \
    --workdir /tmp/niles_convergence_ref20k_s${s}_w0.2_spec_s${s} \
    --final_eval_batch 128 --suffix _spec_s${s}_eval128 \
    >> $LOG/spec_s${s}_eval.log 2>&1
  echo "[chain] seed $s eval rc=$?"
done

echo "[chain] NiLES chain done"
touch /tmp/r5_niles_chain_done
