#!/bin/bash
# Round-5 chip chain, take 2 — after fixing the orbax async-save crash
# (sync checkpointing + non-fatal save) that killed both composed-run
# attempts at their final save.  Strictly serialized.
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
    echo "[chain2] probe attempt $i failed; sleeping 150 s"
    sleep 150
  done
  return 1
}

sleep 150   # zero-client cooldown after killing the old-code trainer

echo "[chain2] 1: third kl_zero flagship seed (w=0.2, seed 3) $(date +%H:%M)"
rm -rf /tmp/niles_convergence_ref20k_s3_w0.2_spec_s3
probe
timeout 7200 python experiments/niles_convergence.py --regime ref20k \
  --steps 1500 --kl_zero --spectrum_weight 0.2 --seed 3 \
  --final_eval_batch 128 --suffix _spec_s3 >> $LOG/spec_s3b.log 2>&1
echo "[chain2] 1 rc=$? $(date +%H:%M)"

echo "[chain2] 2: composed SDE+spectrum rerun"
rm -rf /tmp/niles_convergence_ref20k_s0_w0.2_sdespec
probe
timeout 8100 python experiments/niles_convergence.py --regime ref20k \
  --steps 1600 --spectrum_weight 0.2 --seed 0 --final_eval_batch 128 \
  --suffix _sdespec >> $LOG/sdespec3.log 2>&1
echo "[chain2] 2 rc=$? $(date +%H:%M)"

echo "[chain2] 3: solo kernel A/B"
probe
timeout 1200 python experiments/bench_dense3d.py > $LOG/dense3d_solo.log 2>&1
echo "[chain2] 3 rc=$? $(date +%H:%M)"

echo "[chain2] 4: el-step stage profile"
timeout 900 python experiments/profile_el_step.py > $LOG/el_step_profile.log 2>&1
echo "[chain2] 4 rc=$? $(date +%H:%M)"

echo "[chain2] 5: cylinder 912-el order-6 campaign"
probe
timeout 6000 python experiments/large_cylinder_campaign.py --order 6 \
  --num_steps 120000 --steps_per_dispatch 1000 \
  --out /tmp/cyl_r5_forces.npz > $LOG/cylinder_r5.log 2>&1
echo "[chain2] 5 rc=$? $(date +%H:%M)"

echo "[chain2] 6: TGV 40^3:7 rung"
probe
timeout 5400 python experiments/taylor_green_3d_campaign.py \
  --cases 40:7 --t_end 20 \
  --out experiments/tgv_40_7.json > $LOG/tgv_40_7.log 2>&1
echo "[chain2] 6 rc=$? $(date +%H:%M)"

echo "[chain2] done $(date +%H:%M)"
touch /tmp/r5_chain2_done
