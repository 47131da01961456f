#!/bin/bash
# Round-10 TPU campaign chain (one chip — jobs strictly sequential):
#   1. de Vahl Davis natural-convection ladder Ra 1e3..1e6 (f32, chip)
#   2. NiLES convergence at the REFERENCE regime proper (48x48 order-8
#      Re-20000 DNS -> 12x12 order-4 training), KL held at zero so the
#      short run spends its gradient budget on MSE (VERDICT r1 #8)
#   3. 3D Taylor-Green Re-1600 at 256^3 effective (32^3 elements order 7)
#
# Each job: bounded by timeout, logged, retried once after a fresh
# device probe (tunneled TPU workers crash transiently — see
# .claude/skills/verify/SKILL.md).
set -u
cd "$(dirname "$0")/.."
LOGDIR=experiments/logs_r2_tpu
mkdir -p "$LOGDIR"

probe() {
  # Compute-probe: init-only jax.devices() checks green-light wedged
  # workers whose real dispatch hangs (NOTES_ROUND11.md) — a liveness
  # probe must run an actual jitted dispatch.  First dispatch after a
  # worker recovery has been observed to take ~190 s; budget 300 s.
  timeout 300 python -c "
import jax, jax.numpy as jnp
assert jax.devices()[0].platform == 'tpu'
x = jnp.ones((256, 256))
assert float((x @ x).sum()) > 0" >/dev/null 2>&1
}

run_job() {  # name timeout_s cmd...
  local name=$1 tmo=$2; shift 2
  local log="$LOGDIR/${name}.log"
  for attempt in 1 2; do
    echo "=== $name attempt $attempt: $(date -u +%H:%M:%S) ===" >> "$log"
    timeout "$tmo" "$@" >> "$log" 2>&1
    local rc=$?
    echo "rc=$rc" >> "$log"
    [ $rc -eq 0 ] && return 0
    echo "$name failed (rc=$rc); re-probing device" >> "$log"
    probe || sleep 120
  done
  return 1
}

# Per-Ra invocations with per-Ra output files: the all-or-nothing ladder
# died with a session stall twice (rounds 9/10) and lost every completed
# rung.  Completed rungs are skipped on re-entry.
valid_json() {  # honor the re-entry skip only for intact artifacts
  [ -f "$1" ] && python -c "import json,sys; json.load(open(sys.argv[1]))" \
    "$1" >/dev/null 2>&1
}

for ra in 1e3 1e4 1e5 1e6; do
  valid_json "experiments/nc_tpu_${ra}.json" && continue
  run_job "nc_ladder_tpu_${ra}" 1200 \
    python -u experiments/natural_convection_campaign.py --tpu \
      --ras "$ra" --out "experiments/nc_tpu_${ra}.json"
done
python - <<'PY'
import glob, json
cases, meta = [], {}
for f in sorted(glob.glob('experiments/nc_tpu_*.json')):
    try:
        with open(f) as fh:
            r = json.load(fh)
        cases += r['cases']
        meta = {k: r[k] for k in ('platform', 'dtype')}
    except (json.JSONDecodeError, KeyError) as e:  # truncated rung artifact
        print(f'skipping malformed {f}: {e}')
if cases:
    cases.sort(key=lambda c: c['ra'])
    with open('experiments/natural_convection_tpu.json', 'w') as fh:
        json.dump({**meta, 'cases': cases}, fh, indent=2)
PY

# NiLES ref20k: datagen is skipped when train_*.h5 shards exist, but it has
# no mid-run resume — wipe a PARTIAL dataset (expected: 50 train shards)
# before each attempt so a retry never trains on incomplete data.
clean_partial_ref20k() {
  local d=/tmp/niles_convergence_ref20k/data
  [ -d "$d" ] || return 0
  local n
  n=$(ls "$d"/train_*.h5 2>/dev/null | wc -l)
  if [ "$n" -lt 50 ]; then
    echo "wiping partial ref20k dataset ($n/50 train shards)" \
      >> "$LOGDIR/niles_ref20k.log"
    rm -rf "$d"
  fi
}
# Completed this round (experiments/niles_convergence_ref20k_result.json:
# train MSE -49.4%, eval beats the zero-forcing baseline) — skip on re-entry.
if ! valid_json experiments/niles_convergence_ref20k_result.json; then
for attempt in 1 2; do
  clean_partial_ref20k
  echo "=== niles_ref20k attempt $attempt: $(date -u +%H:%M:%S) ===" \
    >> "$LOGDIR/niles_ref20k.log"
  timeout 14000 python -u experiments/niles_convergence.py \
    --regime ref20k --kl_zero --steps 600 \
    >> "$LOGDIR/niles_ref20k.log" 2>&1
  rc=$?
  echo "rc=$rc" >> "$LOGDIR/niles_ref20k.log"
  [ $rc -eq 0 ] && break
  probe || sleep 120
done
fi

valid_json experiments/tgv_32_7.json || run_job tgv_32_7 10000 \
  python -u experiments/taylor_green_3d_campaign.py --cases 32:7 \
    --t_end 10.5 --out experiments/tgv_32_7.json

echo "chain done: $(date -u)" >> "$LOGDIR/chain_status.log"
