#!/bin/bash
# Queued TPU measurements (run the moment the axon tunnel is back).
# Writes logs under /tmp/tpu_measurements/.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/tpu_measurements

echo "=== 0. tunnel probe ==="
timeout 600 python -c "import jax; print(jax.devices())" || {
  echo "tunnel still down"; exit 1; }

echo "=== 1. bench.py (driver metric; validates the batched Mosaic kernel"
echo "        via the built-in correctness cross-check + escape hatch) ==="
timeout 900 python -u bench.py 2>&1 | tee /tmp/tpu_measurements/bench.log

echo "=== 2. component-batched stiffness A/B ==="
timeout 900 python -u experiments/bench_batched_stiffness.py \
  2>&1 | tee /tmp/tpu_measurements/batched_ab.log

echo "=== 3. large cylinder: projection off vs on (roadmap r5 item 1) ==="
timeout 3000 python -u experiments/profile_large_cylinder.py --steps 200 \
  2>&1 | tee /tmp/tpu_measurements/cyl_base.log
timeout 3000 python -u experiments/profile_large_cylinder.py --steps 200 \
  --projection 2>&1 | tee /tmp/tpu_measurements/cyl_proj.log

echo "=== 4. large cylinder: element-FDM viscous preconditioner A/B ==="
timeout 3000 python -u experiments/profile_large_cylinder.py --steps 200 \
  --viscous-fdm 2>&1 | tee /tmp/tpu_measurements/cyl_vfdm.log

echo "=== 5. affine-kernel MXU precision x tile A/B ==="
timeout 3000 python -u experiments/bench_precision_ab.py \
  2>&1 | tee /tmp/tpu_measurements/precision_ab.log

echo "=== 6. NSE-step FDM transform precision A/B ==="
timeout 3000 python -u experiments/bench_step_precision.py --steps 2000 \
  2>&1 | tee /tmp/tpu_measurements/step_precision_ab.log

echo "=== done; order-7 campaign is a separate long run: ==="
echo "  python experiments/large_cylinder_campaign.py --order 7 --num_steps 150000"
