"""Aggregates the round-5 NiLES evidence into one summary artifact.

Round-5 additions over ``summarize_niles_r4.py``:

* the COMPOSED reference-default configuration (VERDICT r4 #1) —
  LatentSDE processor + KL ramp + spectrum_loss_weight = 0.2
  (``..._result_sdespec.json``): must beat the zero-forcing baseline on
  eval_mse AND tke_err at the 8/16-step horizons with a non-collapsed
  posterior;
* a THIRD kl_zero flagship seed (seed 3, ``..._result_spec_s3.json``)
  so the deterministic headline rests on 3 seeds;
* the batch-128 final-checkpoint eval (VERDICT r4 #9) recorded wherever
  the run carried ``final_batch_eval``.

Writes ``experiments/niles_r5_summary.json``.
"""

import glob
import json
import os

HERE = os.path.dirname(os.path.abspath(__file__))
REQUIRED = ['mse@8', 'mse@16', 'tke_err@8', 'tke_err@16']


def load(path):
  with open(path) as fh:
    return json.load(fh)


def vs_baseline_rows(last):
  rows = {}
  for metric in ('mse', 'mse@8', 'mse@16', 'tke_err', 'tke_err@8',
                 'tke_err@16'):
    if metric.startswith('mse'):
      model_k = f'eval_{metric}'
      base_k = f'eval_mse_baseline{metric[3:]}'
    else:
      model_k = f'eval_{metric}'
      base_k = model_k.replace('tke_err', 'tke_err_baseline', 1)
    if model_k in last and base_k in last:
      model, base = last[model_k], last[base_k]
      rows[metric] = {
          'model': round(model, 5), 'baseline': round(base, 5),
          'model_beats_baseline': bool(model < base),
          'rel_improvement': round(1.0 - model / base, 4) if base else None,
      }
  return rows


def run_summary(result):
  evals = result.get('eval_history', [])
  last = evals[-1] if evals else {}
  rows = vs_baseline_rows(last)
  out = {
      'config': result.get('config'),
      'train_mse_first': result.get('first_train_mse'),
      'train_mse_last': result.get('last_train_mse'),
      'final_eval_vs_baseline': rows,
      'wins_required': REQUIRED,
      'all_required_wins': all(
          rows.get(k, {}).get('model_beats_baseline', False)
          for k in REQUIRED),
      'posterior_stats_last': {
          k: last.get(f'eval_{k}')
          for k in ('z0_means', 'z1_means', 'z1_stds')},
      'cg_max_iters_last': last.get('eval_cg_max_iters'),
  }
  fbe = result.get('final_batch_eval')
  if fbe:
    # Keys look like 'eval_final128_<metric>'; rewrite to 'eval_<metric>'
    # so the same comparison table applies.
    import re
    fl = {}
    batch = None
    for k, v in fbe.items():
      m = re.match(r'eval_final(\d+)_(.*)', k)
      if m:
        batch = int(m.group(1))
        fl[f'eval_{m.group(2)}'] = v
    brows = vs_baseline_rows(fl)
    if brows:
      out['final_batch_eval_batch_size'] = batch
      out['final_batch_eval_vs_baseline'] = brows
      out['final_batch_eval_all_required_wins'] = all(
          brows.get(k, {}).get('model_beats_baseline', False)
          for k in REQUIRED)
  return out


def main():
  summary = {'seeds': {}, 'composed_sde_spectrum': None}
  weights = {}
  for path in sorted(glob.glob(
      os.path.join(HERE, 'niles_convergence_ref20k_result_spec_s*.json'))):
    if path.endswith('_eval128.json'):
      continue
    result = load(path)
    cfg = result.get('config', {})
    seed = cfg.get('seed', '?')
    key = f'seed{seed}_w{cfg.get("spectrum_loss_weight", 0)}'
    summary['seeds'][key] = run_summary(result)
    weights[key] = cfg.get('spectrum_loss_weight', 0)

  comp = os.path.join(HERE, 'niles_convergence_ref20k_result_sdespec.json')
  if os.path.exists(comp):
    c = run_summary(load(comp))
    z = (c.get('posterior_stats_last') or {}).get('z1_stds')
    c['posterior_non_collapsed'] = bool(z is not None and 0.2 < z < 5.0)
    summary['composed_sde_spectrum'] = c
    summary['composed_wins_all_with_live_posterior'] = bool(
        c['all_required_wins'] and c['posterior_non_collapsed'])

  wmax = max(weights.values(), default=0)
  flagship = sorted(k for k, w in weights.items() if w == wmax)
  summary['flagship_weight'] = wmax
  summary['flagship_seeds'] = flagship
  summary['num_flagship_seeds'] = len(flagship)
  summary['all_flagship_seeds_win_all'] = len(flagship) >= 3 and all(
      summary['seeds'][k]['all_required_wins'] for k in flagship)
  out = os.path.join(HERE, 'niles_r5_summary.json')
  with open(out + '.tmp', 'w') as fh:
    json.dump(summary, fh, indent=1)
  os.replace(out + '.tmp', out)
  brief = {
      'flagship_seeds': flagship,
      'all_flagship_seeds_win_all': summary['all_flagship_seeds_win_all'],
      'composed_wins_all_with_live_posterior': summary.get(
          'composed_wins_all_with_live_posterior'),
  }
  print(json.dumps(brief, indent=1))


if __name__ == '__main__':
  main()
