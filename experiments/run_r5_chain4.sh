#!/bin/bash
# Round-5 chip chain, take 4.  Take-3: seed-3 artifact LANDED (3/3
# flagship seeds win); the composed rerun wedged at its step-64 eval
# dispatch (worker stall).  This chain: longer cooldown, composed first
# (now with 400-step checkpoints so any further crash resumes), then the
# cheap measurement items, then cylinder, then TGV.
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
    echo "[chain4] probe attempt $i failed; sleeping 150 s"
    sleep 150
  done
  return 1
}

sleep 180   # zero-client cooldown after killing the wedged trainer

echo "[chain4] 1: composed SDE+spectrum (checkpointed) $(date +%H:%M)"
probe
timeout 8100 python experiments/niles_convergence.py --regime ref20k \
  --steps 1600 --spectrum_weight 0.2 --seed 0 --final_eval_batch 128 \
  --suffix _sdespec >> $LOG/sdespec4.log 2>&1
rc=$?
echo "[chain4] 1 rc=$rc $(date +%H:%M)"
if [ $rc -ne 0 ]; then
  echo "[chain4] 1 retry (resume from last checkpoint)"
  probe
  timeout 8100 python experiments/niles_convergence.py --regime ref20k \
    --steps 1600 --spectrum_weight 0.2 --seed 0 --final_eval_batch 128 \
    --suffix _sdespec >> $LOG/sdespec4b.log 2>&1
  echo "[chain4] 1 retry rc=$? $(date +%H:%M)"
fi

echo "[chain4] 2: solo kernel A/B"
probe
timeout 1200 python experiments/bench_dense3d.py > $LOG/dense3d_solo.log 2>&1
echo "[chain4] 2 rc=$? $(date +%H:%M)"

echo "[chain4] 3: el-step stage profile"
timeout 900 python experiments/profile_el_step.py > $LOG/el_step_profile.log 2>&1
echo "[chain4] 3 rc=$? $(date +%H:%M)"

echo "[chain4] 4: cylinder 912-el order-6 campaign"
probe
timeout 6000 python experiments/large_cylinder_campaign.py --order 6 \
  --num_steps 120000 --steps_per_dispatch 1000 \
  --out /tmp/cyl_r5_forces.npz > $LOG/cylinder_r5.log 2>&1
echo "[chain4] 4 rc=$? $(date +%H:%M)"

echo "[chain4] 5: TGV 40^3:7 rung"
probe
timeout 5400 python experiments/taylor_green_3d_campaign.py \
  --cases 40:7 --t_end 20 \
  --out experiments/tgv_40_7.json > $LOG/tgv_40_7.log 2>&1
echo "[chain4] 5 rc=$? $(date +%H:%M)"

echo "[chain4] done $(date +%H:%M)"
touch /tmp/r5_chain4_done
