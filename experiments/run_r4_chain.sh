#!/bin/bash
# Round-4 chip queue: waits for the NiLES seed-0 run to finish (rc marker
# in its log), then runs the TGV 32^3:7 campaign and the Ghia cavity
# validation sequentially.  One chip job at a time (verify-skill pattern).
set -u
cd /root/repo
LOG_DIR=experiments/logs_r4
S0_LOG=$LOG_DIR/ref20k_spec_s0.log

echo "[chain] waiting for seed-0 NiLES run to finish..."
while ! grep -q '^rc=' "$S0_LOG" 2>/dev/null; do sleep 60; done
echo "[chain] seed-0 done ($(grep '^rc=' "$S0_LOG")); probing chip"

probe() {
  timeout 300 python -c "
import jax, time
t0 = time.time()
import jax.numpy as jnp
x = jnp.ones((1024, 1024))
(x @ x).block_until_ready()
print('probe ok', round(time.time() - t0, 1), 's')
" 2>&1 | tail -1
}
for i in 1 2 3; do
  out=$(probe)
  echo "[chain] probe attempt $i: $out"
  case "$out" in *"probe ok"*) break;; esac
  sleep 120
done

echo "[chain] TGV 32^3:7 campaign"
timeout 7200 python -u experiments/taylor_green_3d_campaign.py \
  --cases 32:7 --t_end 10.5 --alpha 0.05 \
  --out experiments/tgv_32_7.json > $LOG_DIR/tgv32.log 2>&1
echo "rc=$?" >> $LOG_DIR/tgv32.log
tail -3 $LOG_DIR/tgv32.log

echo "[chain] Ghia cavity Re 100/1000"
timeout 5400 python -u experiments/ghia_cavity.py \
  > $LOG_DIR/ghia.log 2>&1
echo "rc=$?" >> $LOG_DIR/ghia.log
tail -3 $LOG_DIR/ghia.log
echo "[chain] done"
