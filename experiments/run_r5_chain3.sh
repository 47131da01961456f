#!/bin/bash
# Round-5 chip chain, take 3.  Take-2 state: seed-3 TRAINED fully and
# checkpointed at 1500 (sync saves work), but the final batch-128 eval
# crashed on the 40-window eval split and took the artifact with it —
# now clamped to the split size and non-fatal.  Item 1 RESUMES seed-3
# from its checkpoint (+64 steps so one periodic eval row lands in the
# artifact), item 2 reruns the composed config from scratch.
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
    echo "[chain3] probe attempt $i failed; sleeping 150 s"
    sleep 150
  done
  return 1
}

sleep 150   # zero-client cooldown after killing the take-2 trainer

echo "[chain3] 1: seed-3 resume 1500 -> 1564 + final eval $(date +%H:%M)"
probe
timeout 3600 python experiments/niles_convergence.py --regime ref20k \
  --steps 1564 --kl_zero --spectrum_weight 0.2 --seed 3 \
  --final_eval_batch 128 --suffix _spec_s3 >> $LOG/spec_s3c.log 2>&1
echo "[chain3] 1 rc=$? $(date +%H:%M)"

echo "[chain3] 2: composed SDE+spectrum rerun"
rm -rf /tmp/niles_convergence_ref20k_s0_w0.2_sdespec
probe
timeout 8100 python experiments/niles_convergence.py --regime ref20k \
  --steps 1600 --spectrum_weight 0.2 --seed 0 --final_eval_batch 128 \
  --suffix _sdespec >> $LOG/sdespec3.log 2>&1
echo "[chain3] 2 rc=$? $(date +%H:%M)"

echo "[chain3] 3: solo kernel A/B"
probe
timeout 1200 python experiments/bench_dense3d.py > $LOG/dense3d_solo.log 2>&1
echo "[chain3] 3 rc=$? $(date +%H:%M)"

echo "[chain3] 4: el-step stage profile"
timeout 900 python experiments/profile_el_step.py > $LOG/el_step_profile.log 2>&1
echo "[chain3] 4 rc=$? $(date +%H:%M)"

echo "[chain3] 5: cylinder 912-el order-6 campaign"
probe
timeout 6000 python experiments/large_cylinder_campaign.py --order 6 \
  --num_steps 120000 --steps_per_dispatch 1000 \
  --out /tmp/cyl_r5_forces.npz > $LOG/cylinder_r5.log 2>&1
echo "[chain3] 5 rc=$? $(date +%H:%M)"

echo "[chain3] 6: TGV 40^3:7 rung"
probe
timeout 5400 python experiments/taylor_green_3d_campaign.py \
  --cases 40:7 --t_end 20 \
  --out experiments/tgv_40_7.json > $LOG/tgv_40_7.log 2>&1
echo "[chain3] 6 rc=$? $(date +%H:%M)"

echo "[chain3] done $(date +%H:%M)"
touch /tmp/r5_chain3_done
