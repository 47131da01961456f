#!/bin/bash
# Round-5 master chip chain — STRICTLY SERIALIZED (the 19:45 worker wedge
# was caused by killing a commensal client mid-dispatch while the trainer
# ran; no more concurrent chip clients, no mid-run kills).
#
# 1. Composed reference-default NiLES run (LatentSDE + KL + spectrum 0.2),
#    1600 steps, batch-128 final eval.  Rerun: the first attempt finished
#    training (winning at step 1536: eval mse 0.295 vs baseline 0.389,
#    tke_err 1.53 vs 2.58 — see logs_r5/sdespec.log) but the worker wedge
#    killed it inside the final eval and the only checkpoint was a tmp.
# 2. Third kl_zero flagship seed (w=0.2, seed 3), 1500 steps, batch-128.
# 3. Solo 3D kernel A/B (VERDICT #2 evidence on an uncontended chip).
# 4. el-step stage profile (VERDICT #8).
# 5. Cylinder 912-el order-6 campaign, 120k steps, smoothed + per-period
#    peak analysis (VERDICT #3).
# 6. TGV 40^3:7 rung with CG telemetry (VERDICT #4) — best effort.
set -u
cd /root/repo
LOG=experiments/logs_r5
mkdir -p $LOG

probe() {
  for i in 1 2 3 4; do
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

rm -rf /tmp/niles_convergence_ref20k_s0_w0.2_sdespec
echo "[chain] 1: composed SDE+spectrum rerun $(date +%H:%M)"
probe
timeout 8100 python experiments/niles_convergence.py --regime ref20k \
  --steps 1600 --spectrum_weight 0.2 --seed 0 --final_eval_batch 128 \
  --suffix _sdespec >> $LOG/sdespec2.log 2>&1
echo "[chain] 1 rc=$? $(date +%H:%M)"

echo "[chain] 2: third kl_zero flagship seed (w=0.2, seed 3)"
probe
timeout 7200 python experiments/niles_convergence.py --regime ref20k \
  --steps 1500 --kl_zero --spectrum_weight 0.2 --seed 3 \
  --final_eval_batch 128 --suffix _spec_s3 >> $LOG/spec_s3.log 2>&1
echo "[chain] 2 rc=$? $(date +%H:%M)"

echo "[chain] 3: solo kernel A/B"
probe
timeout 900 python experiments/bench_dense3d.py > $LOG/dense3d_solo.log 2>&1
echo "[chain] 3 rc=$? $(date +%H:%M)"

echo "[chain] 4: el-step stage profile"
timeout 900 python experiments/profile_el_step.py > $LOG/el_step_profile.log 2>&1
echo "[chain] 4 rc=$? $(date +%H:%M)"

echo "[chain] 5: cylinder 912-el order-6 campaign"
probe
timeout 6600 python experiments/large_cylinder_campaign.py --order 6 \
  --num_steps 120000 --steps_per_dispatch 1000 \
  --out /tmp/cyl_r5_forces.npz > $LOG/cylinder_r5.log 2>&1
echo "[chain] 5 rc=$? $(date +%H:%M)"

echo "[chain] 6: TGV 40^3:7 rung"
probe
timeout 5400 python experiments/taylor_green_3d_campaign.py \
  --cases 40:7 --t_end 20 \
  --out experiments/tgv_40_7.json > $LOG/tgv_40_7.log 2>&1
echo "[chain] 6 rc=$? $(date +%H:%M)"

echo "[chain] master chain done $(date +%H:%M)"
touch /tmp/r5_master_chain_done
