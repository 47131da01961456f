"""Aggregates the round-4 NiLES evidence into one summary artifact.

Reads the per-run convergence artifacts (seed-0/seed-1 spectrum-loss runs
and the latent-SDE/KL run), extracts the headline comparisons the VERDICT
asks for — trained model vs zero-forcing baseline on eval_mse AND
eval_tke_err at the 8- and 16-step horizons, per seed; SDE-path loss
decrease + posterior stats — and writes
``experiments/niles_r4_summary.json``.
"""

import glob
import json
import os

HERE = os.path.dirname(os.path.abspath(__file__))


def load(path):
  with open(path) as fh:
    return json.load(fh)


def seed_summary(result):
  evals = result.get('eval_history', [])
  last = evals[-1] if evals else {}
  out = {
      'config': result.get('config'),
      'train_mse_first': result.get('first_train_mse'),
      'train_mse_last': result.get('last_train_mse'),
      'train_improvement': result.get('improvement'),
  }
  rows = {}
  for metric in ('mse', 'mse@8', 'mse@16', 'tke_err', 'tke_err@8',
                 'tke_err@16'):
    if metric.startswith('mse'):
      model_k = f'eval_{metric}'
      base_k = f'eval_mse_baseline{metric[3:]}'
    else:
      model_k = f'eval_{metric}'
      base_k = f'eval_{metric}'.replace('tke_err', 'tke_err_baseline', 1)
    if model_k in last and base_k in last:
      model, base = last[model_k], last[base_k]
      rows[metric] = {
          'model': round(model, 5), 'baseline': round(base, 5),
          'model_beats_baseline': bool(model < base),
          'rel_improvement': round(1.0 - model / base, 4) if base else None,
      }
  out['final_eval_vs_baseline'] = rows
  out['wins_required'] = ['mse@8', 'mse@16', 'tke_err@8', 'tke_err@16']
  out['all_required_wins'] = all(
      rows.get(k, {}).get('model_beats_baseline', False)
      for k in out['wins_required'])
  for name in ('logspec_pred', 'logspec_target', 'logspec_baseline'):
    if f'final_{name}' in result:
      out[f'final_{name}'] = result[f'final_{name}']
  return out


def sde_summary(result):
  evals = result.get('eval_history', [])
  first, last = (evals[0], evals[-1]) if evals else ({}, {})
  curve = result.get('train_mse_curve', [])
  k = max(1, len(curve) // 10)
  return {
      'config': result.get('config'),
      'train_mse_first10pct': (sum(curve[:k]) / k if curve else None),
      'train_mse_last10pct': (sum(curve[-k:]) / k if curve else None),
      'eval_loss_first': first.get('eval_loss'),
      'eval_loss_last': last.get('eval_loss'),
      'eval_mse_last': last.get('eval_mse'),
      'eval_mse_baseline_last': last.get('eval_mse_baseline'),
      'beats_baseline_mse': (
          last.get('eval_mse', 1e9) < last.get('eval_mse_baseline', -1e9)),
      'kl_path_last': last.get('eval_kl_path'),
      'kl_q0_last': last.get('eval_kl_q0'),
      'posterior_stats_last': {
          k2: last.get(f'eval_{k2}')
          for k2 in ('z0_means', 'z1_means', 'z1_stds')},
  }


def main():
  summary = {'seeds': {}, 'sde': None}
  weights = {}
  for path in sorted(glob.glob(
      os.path.join(HERE, 'niles_convergence_ref20k_result_spec_s*.json'))):
    result = load(path)
    cfg = result.get('config', {})
    seed = cfg.get('seed', '?')
    key = f'seed{seed}_w{cfg.get("spectrum_loss_weight", 0)}'
    summary['seeds'][key] = seed_summary(result)
    weights[key] = cfg.get('spectrum_loss_weight', 0)
  sde_path = os.path.join(HERE, 'niles_convergence_ref20k_result_sde.json')
  if os.path.exists(sde_path):
    summary['sde'] = sde_summary(load(sde_path))
  # Headline claim: every seed of the FLAGSHIP recipe (the largest
  # spectrum weight) wins all required metrics; smaller-weight runs are
  # dose-response ablation points.
  wmax = max(weights.values(), default=0)
  flagship = [k for k, w in weights.items() if w == wmax]
  summary['flagship_weight'] = wmax
  summary['flagship_seeds'] = flagship
  summary['both_seeds_win_all'] = len(flagship) >= 2 and all(
      summary['seeds'][k]['all_required_wins'] for k in flagship)
  out = os.path.join(HERE, 'niles_r4_summary.json')
  with open(out + '.tmp', 'w') as fh:
    json.dump(summary, fh, indent=1)
  os.replace(out + '.tmp', out)
  print(json.dumps({k: (v if k != 'seeds' else
                        {s: r['final_eval_vs_baseline']
                         for s, r in v.items()})
                    for k, v in summary.items()}, indent=1)[:3000])


if __name__ == '__main__':
  main()
