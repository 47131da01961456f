"""Input pipeline over DNS snapshot shards.

Parity target: reference ``swirl_fem/niles/input_pipeline.py`` (create_split
:91, windowing :71-88, per-host sharding :137-143).

TPU-first redesign: the reference routes HDF5 shards through tf.data /
tensorflow_datasets.  Here the pipeline is plain numpy + h5py with a
background prefetch thread: windows of (u, p) trajectories are formed by
index arithmetic over memory-mapped shards, shuffled per epoch, split across
hosts by ``jax.process_index()``, and yielded as numpy batches ready for
``jax.device_put`` with a batch-axis NamedSharding.  No TensorFlow
dependency on the hot path.

Shard format (written by :mod:`swirlfem_tpu.niles.datagen`): HDF5 files with
datasets ``u`` (frames, num_nodes, ndim) and ``p`` (frames, num_pnodes),
chronologically ordered within each file.
"""

from __future__ import annotations

import glob
import os
import queue
import threading
from typing import Iterator

import jax
import numpy as np

try:
  import h5py
except ImportError:  # pragma: no cover
  h5py = None


def _list_shards(dataset_dir: str, train: bool) -> list[str]:
  pattern = 'train_*.h5' if train else 'valid_*.h5'
  shards = sorted(glob.glob(os.path.join(dataset_dir, pattern)))
  if not shards:
    raise FileNotFoundError(
        f'no {pattern} shards under {dataset_dir!r}; run the datagen binary '
        'or set config.debug=True for a synthetic dataset')
  return shards


def _windows_per_shard(num_frames: int, window_size: int,
                       window_stride: int) -> int:
  return max(0, (num_frames - window_size) // window_stride + 1)


def get_num_examples(dataset_dir: str, train: bool, window_size: int,
                     window_stride: int, debug: bool = False) -> int:
  """Number of windows across all shards of the split."""
  if debug:
    # Must match _WindowDataset's synthetic split (window_size + 64 frames)
    # so steps_per_epoch is honest in debug runs.
    return _windows_per_shard(window_size + 64, window_size, window_stride)
  total = 0
  for path in _list_shards(dataset_dir, train):
    with h5py.File(path, 'r') as f:
      total += _windows_per_shard(f['u'].shape[0], window_size, window_stride)
  return total


def _synthetic_frames(config, num_frames: int, seed: int):
  rng = np.random.default_rng(seed)
  num_nodes = config.num_nodes
  num_pnodes = config.num_elements * (config.order - 1) ** config.ndim
  u = rng.standard_normal((num_frames, num_nodes, config.ndim)) * 1e-2
  p = rng.standard_normal((num_frames, num_pnodes)) * 1e-2
  return u.astype(np.float32), p.astype(np.float32)


class _WindowDataset:
  """Random-access view of (u, p) windows across shards."""

  def __init__(self, config, train: bool, window_size: int,
               window_stride: int):
    self.window_size = window_size
    self.debug = config.debug
    if config.debug:
      frames = window_size + 64
      self._u, self._p = _synthetic_frames(config, frames,
                                           seed=0 if train else 1)
      self._index = [(0, i * window_stride) for i in range(
          _windows_per_shard(frames, window_size, window_stride))]
      self._shards = None
    else:
      self._shards = _list_shards(config.dataset_dir, train)
      self._index = []
      for s, path in enumerate(self._shards):
        with h5py.File(path, 'r') as f:
          count = _windows_per_shard(f['u'].shape[0], window_size,
                                     window_stride)
        self._index.extend(
            (s, i * window_stride) for i in range(count))
      self._handles = {}

  def __len__(self):
    return len(self._index)

  def _shard(self, s):
    if s not in self._handles:
      self._handles[s] = h5py.File(self._shards[s], 'r')
    return self._handles[s]

  def get(self, idx: int):
    s, start = self._index[idx]
    if self.debug:
      u = self._u[start:start + self.window_size]
      p = self._p[start:start + self.window_size]
    else:
      f = self._shard(s)
      u = f['u'][start:start + self.window_size]
      p = f['p'][start:start + self.window_size]
    return {'u': np.asarray(u, np.float32), 'p': np.asarray(p, np.float32)}


def create_split(batch_size: int, train: bool, config,
                 prefetch: int = 2, seed: int = 0,
                 restrict_fn=None) -> Iterator[dict]:
  """Yields batches ``{'u': (B, W, nodes, ndim), 'p': (B, W, pnodes)}``.

  Batches are sharded per host: host k draws the k-th contiguous slice of
  each global shuffled epoch (reference parity: input_pipeline.py:137-143).
  Iterates forever (repeat), reshuffling each epoch for training.

  `restrict_fn` (e.g. :func:`swirlfem_tpu.niles.coarsen.make_restriction`)
  is applied to each window dict in the loader thread — the DNS -> LES
  resolution bridge when shards were generated at a finer resolution than
  the training solver.
  """
  window = config.train_window_size if train else config.eval_window_size
  stride = config.train_window_stride if train else config.eval_window_stride
  ds = _WindowDataset(config, train, window, stride)
  host_count = jax.process_count()
  host_id = jax.process_index()
  per_host = len(ds) // host_count
  if per_host < batch_size:
    raise ValueError(
        f'per-host example count {per_host} (of {len(ds)} total over '
        f'{host_count} hosts) is smaller than batch_size {batch_size}: '
        'the loader would never yield a batch')

  def generate():
    rng = np.random.default_rng(seed)
    epoch = 0
    while True:
      order = np.arange(len(ds))
      if train:
        order = rng.permutation(len(ds))
      local = order[host_id * per_host:(host_id + 1) * per_host]
      for i in range(0, len(local) - batch_size + 1, batch_size):
        items = [ds.get(int(j)) for j in local[i:i + batch_size]]
        if restrict_fn is not None:
          items = [restrict_fn(it) for it in items]
        yield {k: np.stack([it[k] for it in items]) for k in items[0]}
      epoch += 1

  if prefetch <= 0:
    yield from generate()
    return

  q: queue.Queue = queue.Queue(maxsize=prefetch)

  def worker():
    for batch in generate():
      q.put(batch)

  thread = threading.Thread(target=worker, daemon=True)
  thread.start()
  while True:
    yield q.get()
