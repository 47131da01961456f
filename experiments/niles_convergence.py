"""NiLES convergence evidence on one host (VERDICT r1 #8).

Runs the REAL pipeline end-to-end at small scale, entirely on the CPU
backend: Kolmogorov DNS generation (``niles/datagen.py``), DNS->LES
restriction (``niles/coarsen.py``), and a few-hundred-step
``train_and_evaluate`` run (solver-in-the-loop loss, adamw, periodic eval
with TKE/spectrum metrics, orbax checkpoints, 8-virtual-device data
parallelism via NamedSharding).  Reference training regime:
``swirl_fem/niles/config/niles.py:24-89`` scaled down to CPU feasibility.

Writes ``experiments/niles_convergence_result.json`` with the train-loss
curve and the eval metric history, and prints a one-line summary.

With ``--tpu`` the same pipeline runs on the attached TPU chip at the
reference's training geometry (12x12 elements, order 4, batch 16, 8-step
rollouts, the flagship width-48 latent-SDE transformer) against a
24x24-order-6 Re-5000 DNS — the closest single-chip analogue of the
reference's production regime (``swirl_fem/niles/config/niles.py:24-89``).

Usage: python experiments/niles_convergence.py [--steps N] [--workdir DIR]
       python experiments/niles_convergence.py --tpu [--steps N]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_TPU = '--tpu' in sys.argv or 'ref20k' in sys.argv  # ref20k runs on the chip
if not _TPU:
  os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                             + ' --xla_force_host_platform_device_count=8')

import jax  # noqa: E402

if not _TPU:
  jax.config.update('jax_platforms', 'cpu')

import ml_collections  # noqa: E402
import numpy as np  # noqa: E402


def small_config(num_train_steps: int) -> ml_collections.ConfigDict:
  """Downscaled NiLES config: 8x8 elements order 3, Re 1000, batch 8."""
  from swirlfem_tpu.niles import config as niles_config

  cfg = niles_config.get_config()
  cfg.batch_size = 8
  cfg.num_steps = 4
  cfg.num_pushforward_steps = 3
  cfg.eval_num_steps = 16
  cfg.permute_elements = False

  cfg.element_grid_size = 8
  cfg.order = 3
  cfg.resolution = cfg.element_grid_size * cfg.order
  cfg.time_order = 2
  cfg.reynolds_number = 1000
  cfg.dt = 1e-3
  cfg.num_nodes = (cfg.resolution + 1) ** 2
  cfg.num_elements = cfg.element_grid_size ** 2
  cfg.num_channels = (cfg.order + 1) ** 2 * cfg.ndim
  cfg.drag_coeff = 0.05  # match the datagen below
  cfg.train_window_size = cfg.num_steps + 3
  cfg.eval_window_size = cfg.eval_num_steps + 3
  cfg.eval_window_stride = 8

  width = 16
  cfg.model.width = width
  cfg.model.dtype = 'float32'
  cfg.model.depth = 4
  cfg.model.pooling_layers = (1, 3)
  cfg.model.num_heads = 4
  # Two stride-4 poolings: 64 tokens -> 4; width doubles at each pooling.
  cfg.model.processor_config.latent_size = width * 4
  cfg.model.processor_config.data_size = width * 4 * 4
  cfg.model.processor_config.num_samples = 2
  cfg.model.processor_config.num_gridpoints = 8
  cfg.model.processor_config.num_sde_layers = 2
  cfg.model.processor_config.num_layers = 1
  cfg.model.processor_config.context_size = 16
  cfg.model.processor_config.hidden_size = 16

  cfg.learning_rate = 0.05  # base lr = 0.05 * 8 / 256 ~ 1.6e-3
  cfg.warmup_epochs = 0.25
  cfg.num_train_steps = num_train_steps
  cfg.log_every_steps = 10
  cfg.eval_every_epochs = 0.5
  cfg.steps_per_eval = 2
  cfg.checkpoint_epochs = 100
  return cfg


def tpu_config(num_train_steps: int) -> ml_collections.ConfigDict:
  """Reference-geometry config for the single-TPU run: 12x12 elements
  order 4, batch 16, 8-step rollouts, flagship model defaults."""
  from swirlfem_tpu.niles import config as niles_config

  cfg = niles_config.get_config()
  cfg.batch_size = 16
  cfg.eval_num_steps = 16
  cfg.eval_window_size = (cfg.eval_num_steps + 3) * cfg.window_step
  cfg.eval_window_stride = 8
  cfg.reynolds_number = 5000   # DNS below resolves this on one chip
  cfg.drag_coeff = 0.05        # match the datagen
  cfg.learning_rate = 0.05     # effective = 0.05 * 16 / 256 ~ 3e-3
  cfg.warmup_epochs = 0.25
  cfg.num_train_steps = num_train_steps
  cfg.log_every_steps = 10
  cfg.eval_every_epochs = 0.5
  cfg.steps_per_eval = 2
  cfg.checkpoint_epochs = 100
  return cfg


def ref20k_config(num_train_steps: int) -> ml_collections.ConfigDict:
  """The reference training regime proper (``swirl_fem/niles/config/
  niles.py:24-89``): 12x12 elements order 4, Re 20000, 8-step rollouts,
  flagship model — batch 16 on the one chip (reference batch 128 is a
  pod-scale knob; lr scales with batch below)."""
  cfg = tpu_config(num_train_steps)
  cfg.reynolds_number = 20000
  return cfg


def generate_dns_ref20k(dataset_dir: str) -> None:
  """The reference datagen sweep config proper (``swirl_fem/niles/datagen/
  config/kolmogorov_re_1000.py:20-57``): 48x48 elements order 8, Re 20000,
  dt 1e-4, drag 0.05, forcing k=4; 60 warmup cycles (t=3) past the laminar
  transient so the shards hold developed turbulence."""
  from swirlfem_tpu.niles import datagen

  os.makedirs(dataset_dir, exist_ok=True)
  for split, cycles, warmup, seed in (('train', 50, 60, 0),
                                      ('valid', 8, 60, 7)):
    cfg = datagen.DatagenConfig(
        resolution=48, order=8, time_order=3, reynolds_number=20000.0,
        num_cycles=cycles, num_steps_per_cycle=500, dt=1e-4,
        snapshot_every=10,  # LES dt = 10 * 1e-4 = 1e-3 (reference config)
        warmup_cycles=warmup, split=split, seed=seed)
    datagen.run_simulation(dataset_dir, cfg)


def generate_dns_tpu(dataset_dir: str) -> None:
  """Mid-size Kolmogorov DNS for the TPU run: 24x24 elements order 6."""
  from swirlfem_tpu.niles import datagen

  os.makedirs(dataset_dir, exist_ok=True)
  for split, cycles in (('train', 15), ('valid', 4)):
    cfg = datagen.DatagenConfig(
        resolution=24, order=6, time_order=2, reynolds_number=5000.0,
        num_cycles=cycles, num_steps_per_cycle=500, dt=2e-4,
        snapshot_every=5,  # LES dt = 5 * 2e-4 = 1e-3
        split=split)
    datagen.run_simulation(dataset_dir, cfg)


def generate_dns(dataset_dir: str) -> None:
  """Small Kolmogorov DNS: 16x16 elements order 4, Re 1000."""
  from swirlfem_tpu.niles import datagen

  os.makedirs(dataset_dir, exist_ok=True)
  for split, cycles in (('train', 12), ('valid', 3)):
    cfg = datagen.DatagenConfig(
        resolution=16, order=4, time_order=2, reynolds_number=1000.0,
        num_cycles=cycles, num_steps_per_cycle=500, dt=2e-4,
        snapshot_every=5,  # LES dt = 5 * 2e-4 = 1e-3
        split=split)
    datagen.run_simulation(dataset_dir, cfg)


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument('--steps', type=int, default=300)
  ap.add_argument('--tpu', action='store_true')
  ap.add_argument('--regime', default=None, choices=[None, 'ref20k'],
                  help="'ref20k' = the reference regime proper (48x48 "
                       'order-8 Re-20000 DNS -> 12x12 order-4 training); '
                       'implies the TPU-geometry model config')
  ap.add_argument('--workdir', default=None)
  ap.add_argument('--dataset_dir', default=None)
  ap.add_argument('--kl_zero', action='store_true',
                  help='hold the KL penalty at 0 for the whole run (the '
                       'deterministic limit; config.kl_zero_epochs knob) so '
                       'a short run spends its gradient budget on MSE')
  ap.add_argument('--lr', type=float, default=None,
                  help='override config.learning_rate')
  ap.add_argument('--seed', type=int, default=0,
                  help='PRNG seed (init/dropout/latent sampling)')
  ap.add_argument('--spectrum_weight', type=float, default=0.0,
                  help='weight on the training-time log-spectrum loss '
                       '(config.spectrum_loss_weight)')
  ap.add_argument('--final_eval_batch', type=int, default=0,
                  help='run one final-checkpoint eval pass at this batch '
                       'size (the reference evaluates at 128)')
  ap.add_argument('--suffix', default='',
                  help='suffix for the result filename')
  args = ap.parse_args()
  if args.regime == 'ref20k':
    base = '/tmp/niles_convergence_ref20k'
  elif args.tpu:
    base = '/tmp/niles_convergence_tpu'
  else:
    base = '/tmp/niles_convergence'
  args.workdir = args.workdir or base
  args.dataset_dir = args.dataset_dir or base + '/data'

  # Surface the trainer's step/eval logging without app.run (absl default
  # verbosity swallows INFO otherwise — round-12 operational note).
  from absl import logging as absl_logging
  absl_logging.set_verbosity(absl_logging.INFO)

  import glob as _glob

  from swirlfem_tpu.niles import coarsen
  from swirlfem_tpu.niles import input_pipeline
  from swirlfem_tpu.niles import train as niles_train

  t0 = time.time()
  if not _glob.glob(os.path.join(args.dataset_dir, 'train_*.h5')):
    print('generating DNS data ...', flush=True)
    gen = {None: generate_dns_tpu if args.tpu else generate_dns,
           'ref20k': generate_dns_ref20k}[args.regime]
    gen(args.dataset_dir)
  t_dns = time.time() - t0

  if args.regime == 'ref20k':
    cfg = ref20k_config(args.steps)
  elif args.tpu:
    cfg = tpu_config(args.steps)
  else:
    cfg = small_config(args.steps)
  cfg.dataset_dir = args.dataset_dir
  cfg.eval_baseline = True
  if args.kl_zero:
    cfg.kl_zero_epochs = 10**6
  if args.lr is not None:
    cfg.learning_rate = args.lr
  cfg.seed = args.seed
  cfg.spectrum_loss_weight = args.spectrum_weight
  if args.final_eval_batch:
    cfg.final_eval_batch_size = args.final_eval_batch
  # Mid-run checkpoints: a chip-worker wedge or crash then costs a resume,
  # not the whole campaign (three composed-run attempts died at/after
  # their only save).
  cfg.checkpoint_every_steps = 400
  if args.seed or args.spectrum_weight:
    # Seed/ablation runs each need their own checkpoint dir — restoring a
    # previous variant's checkpoint would silently skip training.
    args.workdir = (f'{args.workdir}_s{args.seed}'
                    f'_w{args.spectrum_weight:g}{args.suffix}')
  frozen = ml_collections.FrozenConfigDict(cfg)

  # DNS -> LES restriction on load.
  if args.regime == 'ref20k':
    src_grid, src_order = 48, 8
  else:
    src_grid, src_order = (24, 6) if args.tpu else (16, 4)
  restrict = coarsen.make_restriction(src_grid, src_order, frozen)
  orig_create_split = input_pipeline.create_split
  input_pipeline.create_split = (
      lambda *a, **kw: orig_create_split(*a, **kw, restrict_fn=restrict))

  # Capture the metric history from the writer.
  history = {'train': [], 'eval': []}
  from clu import metric_writers
  orig_writer = metric_writers.create_default_writer

  class Recorder:
    def write_hparams(self, *a, **kw):
      pass

    def write_scalars(self, step, scalars):
      kind = 'eval' if any(k.startswith('eval') for k in scalars) else 'train'
      history[kind].append({'step': int(step), **{
          k: float(v) for k, v in scalars.items()}})

    def flush(self):
      pass

  metric_writers.create_default_writer = lambda *a, **kw: Recorder()
  try:
    t1 = time.time()
    niles_train.train_and_evaluate(frozen, args.workdir)
    t_train = time.time() - t1
  finally:
    metric_writers.create_default_writer = orig_writer
    input_pipeline.create_split = orig_create_split

  losses = [h['train_mse'] for h in history['train'] if 'train_mse' in h]
  evals = [h for h in history['eval'] if 'eval_mse' in h]
  final_batch_evals = [h for h in history['eval']
                       if any(k.startswith('eval_final') for k in h)]
  result = {
      'config': {'element_grid_size': frozen.element_grid_size,
                 'order': frozen.order,
                 'reynolds': float(frozen.reynolds_number),
                 'batch_size': frozen.batch_size,
                 'rollout_steps': frozen.num_steps,
                 'train_steps': args.steps,
                 'dns': (f'{src_grid}x{src_grid} elements order {src_order},'
                         ' dt 2e-4'),
                 'kl_zero': args.kl_zero,
                 'learning_rate': float(frozen.learning_rate),
                 'seed': args.seed,
                 'spectrum_loss_weight': args.spectrum_weight,
                 'platform': jax.devices()[0].platform},
      'dns_seconds': round(t_dns, 1),
      'train_seconds': round(t_train, 1),
      'devices': len(jax.devices()),
      'train_mse_curve': [round(v, 8) for v in losses],
      'eval_history': evals,
      'first_train_mse': losses[0] if losses else None,
      'last_train_mse': losses[-1] if losses else None,
      'improvement': (1 - losses[-1] / losses[0]) if losses else None,
  }
  if final_batch_evals:
    # Final-checkpoint eval at the reference batch size (VERDICT r4 #9).
    result['final_batch_eval'] = {
        k: round(v, 6) for k, v in final_batch_evals[-1].items()
        if 'logspec' not in k}
  if evals and 'eval_mse_baseline' in evals[-1]:
    last = evals[-1]
    result['final_eval_mse'] = last['eval_mse']
    result['baseline_eval_mse'] = last['eval_mse_baseline']
    result['vs_baseline'] = 1 - last['eval_mse'] / last['eval_mse_baseline']
    for k in ('tke_err', 'tke_err@8', 'tke_err@16'):
      bk = k.replace('tke_err', 'tke_err_baseline', 1)
      if f'eval_{k}' in last:
        result[f'final_eval_{k}'] = last[f'eval_{k}']
      if f'eval_{bk}' in last:
        result[f'baseline_eval_{k}'] = last[f'eval_{bk}']
    # Final binned log-spectra (pred / DNS target / zero-forcing baseline).
    for name in ('logspec_pred', 'logspec_target', 'logspec_baseline'):
      keys = sorted(k for k in last if k.startswith(f'eval_{name}_'))
      if keys:
        result[f'final_{name}'] = [round(last[k], 5) for k in keys]
  stem = {None: ('niles_convergence_tpu_result' if args.tpu
                 else 'niles_convergence_result'),
          'ref20k': 'niles_convergence_ref20k_result'}[args.regime]
  out = os.path.join(
      os.path.dirname(os.path.abspath(__file__)), stem + args.suffix + '.json')
  with open(out + '.tmp', 'w') as f:
    json.dump(result, f, indent=1)
  os.replace(out + '.tmp', out)  # atomic: no truncated artifact on timeout
  print(json.dumps({k: result[k] for k in
                    ('first_train_mse', 'last_train_mse', 'improvement',
                     'final_eval_mse', 'baseline_eval_mse', 'vs_baseline',
                     'train_seconds') if k in result}))


if __name__ == '__main__':
  main()
