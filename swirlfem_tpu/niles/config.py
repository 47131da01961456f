"""Hyperparameter configuration for the NiLES training pipeline.

Parity target: reference ``swirl_fem/niles/config/niles.py`` (get_config
:20-112, metrics :115, sweep :138).  Same physical/solver/model parameters;
the training defaults reproduce the reference's 12x12-element order-4
Re=20000 Kolmogorov closure task with 8-step differentiable rollouts.
"""

import ml_collections


def get_config() -> ml_collections.ConfigDict:
  """Default hyperparameters."""
  config = ml_collections.ConfigDict()

  config.batch_size = 128
  config.debug = False  # True => synthetic dataset for fast iteration.

  # Solver unroll during training / evaluation.
  config.num_steps = 8
  config.eval_num_steps = 125
  config.permute_elements = True
  config.num_pushforward_steps = config.num_steps - 1
  # Rematerialize each rollout step in the backward pass (jax.checkpoint):
  # cuts peak activation memory from O(num_steps) to O(1) rollout steps at
  # ~1/3 extra flops — turn on when batch x rollout doesn't fit HBM.
  config.remat = False

  config.model_name = 'multiscale_transformer'
  config.model = ml_collections.ConfigDict()
  config.model.width = 48
  # 'bfloat16' halves activation HBM traffic on TPU (params stay f32).
  config.model.dtype = 'bfloat16'
  config.model.num_layers = 6
  config.model.num_heads = 4
  config.model.use_residuals = True
  config.model.freeze_encoder = False
  config.model.depth = 6
  config.model.num_initial_heads = 1
  config.model.pooling_layers = (config.model.depth - 4,
                                 config.model.depth - 2)
  config.model.pooling_kernel = (1, 5)
  config.model.initial_kv_pooling_strides = (1, 4)
  config.model.pooling_strides_q = (1, 4)
  config.model.qkv_tile_reps = (4, 1)

  # Stochastic latent-SDE processor; num_samples = 0 disables it.
  config.model.processor_config = ml_collections.ConfigDict()
  num_samples = 4
  config.model.mean_after_decoder = num_samples > 0
  config.model.processor_config.num_samples = num_samples
  config.model.processor_config.use_transformer = True
  config.model.processor_config.data_size = config.model.width * 4 * 9
  config.model.processor_config.latent_size = config.model.width * 4
  config.model.processor_config.num_gridpoints = 16
  config.model.processor_config.num_sde_layers = 4
  config.model.processor_config.num_layers = 2
  config.model.processor_config.context_size = 32
  config.model.processor_config.hidden_size = 32
  config.model.processor_config.prior_scale = 0.1

  config.window_step = 1

  # Physical / solver configuration (Kolmogorov flow closure).
  config.dataset = 'kolmogorov_flow'
  config.dataset_dir = ''
  config.ndim = 2
  config.element_grid_size = 12
  config.order = 4
  config.resolution = config.element_grid_size * config.order
  config.time_order = 3
  # NOTE: the reference ships 0.04 here vs 0.05 in its datagen config
  # (niles/config/niles.py:78 vs datagen/config/kolmogorov_re_1000.py:47);
  # we keep 0.04 for parity but set drag/wavenumber to your datagen values
  # when training on your own data.
  config.drag_coeff = 0.04
  config.forcing_wavenumber = 4.0
  config.reynolds_number = 20000
  config.dt = 1e-3 * config.window_step
  config.alpha = 0.0
  config.num_nodes = (config.resolution + 1) ** 2
  config.num_elements = config.element_grid_size ** 2
  config.num_channels = (config.order + 1) ** 2 * config.ndim

  config.train_window_size = (config.num_steps + 3) * config.window_step
  config.train_window_stride = 1
  config.eval_window_size = (config.eval_num_steps + 3) * config.window_step
  config.eval_window_stride = 4

  # PRNG seed for init/dropout/latent sampling (multi-seed evidence runs).
  config.seed = 0
  # Spectrum-aware training loss: weight on the squared log-spectrum
  # mismatch of the rollout's second-half mean TKE (same statistic the
  # eval tracks as tke_err).  0 disables (pure MSE+KL, reference parity);
  # > 0 counters the over-dissipative closure that wins MSE while
  # regressing the energy spectrum.
  config.spectrum_loss_weight = 0.0

  # Optimization.
  config.num_epochs = 15.0
  config.learning_rate = 0.0075
  config.grad_clip_norm = 0.01
  config.weight_decay = 0.05
  config.warmup_epochs = 1.0
  config.kl_penalty = 0.01
  config.kl_transition_epochs = 10.0
  config.kl_zero_epochs = 0

  config.log_every_steps = 100
  config.checkpoint_epochs = 1
  config.eval_every_epochs = 0.1
  config.cache = True
  config.profile_dir = ''  # set to capture a jax profiler trace
  config.num_train_steps = -1
  config.steps_per_eval = 10
  # Also evaluate the zero-forcing (no-model) coarse-solver rollout on each
  # eval batch and report it as eval_mse_baseline[@h] / eval_tke_err_baseline
  # — the yardstick the learned correction must beat.
  config.eval_baseline = False
  return config


def metrics() -> list[str]:
  return [
      'steps_per_second',
      'train_learning_rate',
      'train_kl_penalty',
      'train_loss',
      'train_mse',
      'train_z0_means',
      'train_z1_means',
      'train_z1_stds',
      'eval_loss',
      'eval_mse',
      'eval_mse@1to8',
      'eval_mse@8',
      'eval_mse@16',
      'eval_mse@32',
      'eval_z0_means',
      'eval_z1_means',
      'eval_z1_stds',
      'eval_tke_err',
  ]


def sweep(add):
  """Hyperparameter search over encoder depth."""
  for depth in [36, 40, 48]:
    add(**{'model.depth': depth,
           'model.pooling_layers': (depth - 4, depth - 2)})
