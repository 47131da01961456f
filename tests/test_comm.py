"""Communication layer tests: pscan/preduce, semi-traced scalars, crystal
router vs a numpy oracle (reference pattern: crystal_router_test.py:46-80)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from swirlfem_tpu.parallel.crystal_router import crystal_router_setup
from swirlfem_tpu.parallel.pscan import pscan, preduce
from swirlfem_tpu.parallel.semi_traced import SemiTracedScalar
from swirlfem_tpu.parallel.spmd import device_mesh, spmd_map

pytestmark = pytest.mark.smoke

P = 8


@pytest.fixture(scope='module')
def dmesh():
  return device_mesh('x', P)


@pytest.mark.parametrize('op,expected', [
    (jnp.add, np.concatenate([[0], np.cumsum(np.arange(1, P))])),
    (jnp.maximum, np.concatenate(
        [[np.iinfo(np.int32).min], np.arange(1, P)])),
])
def test_pscan_ops(dmesh, op, expected):
  run = spmd_map(lambda v: pscan(v, op, 'x'), dmesh, 'x')
  out = np.asarray(run(jnp.arange(1, P + 1, dtype=jnp.int32)))
  np.testing.assert_array_equal(out, expected)


def test_pscan_exclusive_sum(dmesh):
  x = jnp.asarray(np.random.default_rng(0).integers(0, 10, P),
                  dtype=jnp.int32)
  run = spmd_map(lambda v: pscan(v, jnp.add, 'x'), dmesh, 'x')
  out = np.asarray(run(x))
  expected = np.concatenate([[0], np.cumsum(np.asarray(x))[:-1]])
  np.testing.assert_array_equal(out, expected)


def test_pscan_with_reduction(dmesh):
  x = jnp.arange(P, dtype=jnp.float64)
  run = spmd_map(lambda v: pscan(v, jnp.multiply, 'x', reduction=True),
                 dmesh, 'x')
  scan, red = run(x + 1)
  expected_scan = np.concatenate([[1], np.cumprod(np.arange(1, P))])
  np.testing.assert_allclose(np.asarray(scan), expected_scan)
  np.testing.assert_allclose(np.asarray(red),
                             np.full(P, np.prod(np.arange(1, P + 1))))


def test_preduce_bitwise(dmesh):
  x = jnp.asarray([0b101, 0b011, 0b110, 0b111, 0b001, 0b010, 0b100, 0b111],
                  dtype=jnp.int32)
  run = spmd_map(lambda v: preduce(v, jnp.bitwise_or, 'x'), dmesh, 'x')
  out = np.asarray(run(x))
  np.testing.assert_array_equal(out, np.full(P, 0b111))


def test_pscan_vector_payload(dmesh):
  x = jnp.asarray(np.arange(P * 3, dtype=np.float64).reshape(P, 3))
  run = spmd_map(lambda v: pscan(v, jnp.add, 'x'), dmesh, 'x')
  out = np.asarray(run(x))
  expected = np.concatenate(
      [np.zeros((1, 3)), np.cumsum(np.asarray(x), axis=0)[:-1]], axis=0)
  np.testing.assert_allclose(out, expected)


def test_semi_traced_scalar(dmesh):
  def f(v):
    idx, n = SemiTracedScalar.index_and_size('x')
    half = idx < (n // 2)
    # Static schedule from the global view, traced data from the local one.
    np.testing.assert_array_equal(half.global_, np.arange(P) < P // 2)
    return v + jnp.where(half.local, 10, 0)

  run = spmd_map(f, dmesh, 'x')
  out = np.asarray(run(jnp.zeros(P)))
  np.testing.assert_array_equal(out, [10] * (P // 2) + [0] * (P // 2))


def _route_oracle(n, data, target):
  """numpy simulation: multiset of (value rows) arriving at each device."""
  buckets = [[] for _ in range(P)]
  for p in range(P):
    for j in range(int(n[p])):
      buckets[int(target[p, j])].append((p, data[p, j]))
  return buckets


def test_crystal_router_roundtrip(dmesh):
  rng = np.random.default_rng(42)
  cap = 6
  n = rng.integers(0, cap + 1, P).astype(np.int32)
  target = rng.integers(0, P, (P, cap)).astype(np.int32)
  data = rng.standard_normal((P, cap)).astype(np.float64)

  router = crystal_router_setup(dmesh, 'x')
  n_out, data_out, source = router(jnp.asarray(n), jnp.asarray(data),
                                   jnp.asarray(target))
  n_out = np.asarray(n_out)
  data_out = np.asarray(data_out)
  source = np.asarray(source)

  buckets = _route_oracle(n, data, target)
  assert list(n_out) == [len(b) for b in buckets]
  for p in range(P):
    got = sorted(zip(source[p, :n_out[p]].tolist(),
                     data_out[p, :n_out[p]].tolist()))
    expected = sorted((src, float(v)) for src, v in buckets[p])
    assert got == expected, f'device {p}'

  # Inverse routing restores the original multiset per device.
  n_back, data_back, back_src = router(jnp.asarray(n_out),
                                       jnp.asarray(data_out),
                                       jnp.asarray(source))
  n_back = np.asarray(n_back)
  assert list(n_back) == list(n)
  for p in range(P):
    got = sorted(np.asarray(data_back)[p, :n_back[p]].tolist())
    expected = sorted(data[p, :n[p]].tolist())
    np.testing.assert_allclose(got, expected)


def test_crystal_router_pytree_and_growth(dmesh):
  """All data targeted at device 0 forces receive-capacity growth."""
  cap = 4
  n = np.full(P, cap, dtype=np.int32)
  target = np.zeros((P, cap), dtype=np.int32)
  data = {'a': np.arange(P * cap, dtype=np.float64).reshape(P, cap),
          'b': np.arange(P * cap, dtype=np.int32).reshape(P, cap, 1) * 2}

  router = crystal_router_setup(dmesh, 'x')
  n_out, out, source = router(jnp.asarray(n),
                              jax.tree.map(jnp.asarray, data),
                              jnp.asarray(target))
  n_out = np.asarray(n_out)
  assert n_out[0] == P * cap and (n_out[1:] == 0).all()
  got_a = sorted(np.asarray(out['a'])[0, :n_out[0]].tolist())
  np.testing.assert_allclose(got_a, np.arange(P * cap, dtype=np.float64))
  got_b = sorted(np.asarray(out['b'])[0, :n_out[0], 0].tolist())
  np.testing.assert_allclose(got_b, np.arange(P * cap) * 2)
  assert sorted(np.asarray(source)[0, :n_out[0]].tolist()) == sorted(
      list(range(P)) * cap)


@pytest.mark.parametrize('seed', range(12))
def test_ragged_offset_plan_matches_dense_placement(seed):
  """The TPU ragged_all_to_all plan, simulated, equals the dense path.

  XLA:CPU has no ragged-all-to-all, so the multi-participant ragged path
  cannot execute on the virtual test mesh.  Instead `ragged_offsets` is a
  pure function of the all-gathered count matrix; simulating the
  collective's copy semantics with its outputs must place every chunk
  exactly where the dense fallback's compaction (src-major, within-chunk
  order preserved) places it — for random device counts and count
  matrices, including empty rows/columns and zero-traffic devices.
  """
  from swirlfem_tpu.parallel.crystal_router import ragged_offsets

  rng = np.random.default_rng(seed)
  num = int(rng.integers(2, 9))
  cm = rng.integers(0, 5, (num, num)).astype(np.int32)
  if seed % 3 == 0:
    cm[rng.integers(num)] = 0      # a device that sends nothing
  if seed % 4 == 0:
    cm[:, rng.integers(num)] = 0   # a device that receives nothing
  out_capacity = int(cm.sum(axis=0).max()) + 1

  # Per-src send buffers, sorted by destination (as the router sorts):
  # entry = (src, dst, k) encoded uniquely.
  sends = {}
  for s in range(num):
    rows = []
    for d in range(num):
      for k in range(cm[s, d]):
        rows.append(1000 * s + 10 * d + k)
    sends[s] = np.asarray(rows, dtype=np.int64)

  # Simulate ragged_all_to_all: each src copies its dst-chunk
  # send[src][io[dst] : io[dst]+ss[dst]] into
  # out[dst][oo[dst] : oo[dst]+ss[dst]].
  out = {d: np.zeros(out_capacity, dtype=np.int64) for d in range(num)}
  for s in range(num):
    io, ss, oo, rs = (np.asarray(a) for a in ragged_offsets(
        jnp.asarray(cm), s))
    np.testing.assert_array_equal(rs, cm[:, s])
    np.testing.assert_array_equal(ss, cm[s])
    for d in range(num):
      chunk = sends[s][io[d]:io[d] + ss[d]]
      out[d][oo[d]:oo[d] + ss[d]] = chunk

  # Dense-path placement oracle: src-major concatenation, order preserved.
  for d in range(num):
    expected = np.concatenate(
        [sends[s][np.asarray(ragged_offsets(jnp.asarray(cm), s)[0])[d]:]
         [:cm[s, d]] for s in range(num)] or [np.zeros(0, np.int64)])
    n_d = int(cm[:, d].sum())
    np.testing.assert_array_equal(out[d][:n_d], expected)


@pytest.mark.parametrize('seed', range(6))
def test_crystal_router_ppermute_matches_dense(dmesh, seed):
  """Multi-participant execution of the ragged plan's data plumbing.

  The 'ppermute' implementation moves data with P - 1 rotation rounds but
  computes every slice/placement from the SAME ``ragged_offsets`` plan the
  TPU ragged_all_to_all dispatch uses — so running it on the 8-virtual-
  device mesh exercises the send/recv-offset plumbing (not just the plan
  arithmetic) and must be row-for-row identical to the dense fallback,
  including zero-traffic devices and empty sends.
  """
  from swirlfem_tpu.parallel.crystal_router import crystal_router_spmd

  rng = np.random.default_rng(100 + seed)
  cap = 6
  n = rng.integers(0, cap + 1, P).astype(np.int32)
  if seed == 0:
    n[:] = 0              # nobody sends anything
  if seed == 1:
    n[: P // 2] = 0       # half the devices silent
  target = rng.integers(0, P, (P, cap)).astype(np.int32)
  if seed == 2:
    target[:] = 3         # all traffic into one device
  data = {'a': rng.standard_normal((P, cap)),
          'b': (rng.integers(0, 100, (P, cap, 2))).astype(np.int32)}
  out_capacity = P * cap  # cannot overflow

  def run(impl):
    f = spmd_map(
        lambda n_, d_, t_: crystal_router_spmd(
            n_, d_, t_, axis_name='x', out_capacity=out_capacity,
            implementation=impl),
        dmesh, 'x')
    return f(jnp.asarray(n), jax.tree.map(jnp.asarray, data),
             jnp.asarray(target))

  n_d, d_d, s_d = run('dense')
  n_p, d_p, s_p = run('ppermute')
  np.testing.assert_array_equal(np.asarray(n_d), np.asarray(n_p))
  for p in range(P):
    k = int(np.asarray(n_d)[p])
    np.testing.assert_array_equal(np.asarray(s_d)[p, :k],
                                  np.asarray(s_p)[p, :k])
    for leaf_d, leaf_p in zip(jax.tree.leaves(d_d), jax.tree.leaves(d_p)):
      np.testing.assert_array_equal(np.asarray(leaf_d)[p][:k],
                                    np.asarray(leaf_p)[p][:k])


@pytest.mark.parametrize('op', [jnp.add, jnp.multiply, jnp.maximum,
                                jnp.minimum])
def test_tree_pscan_matches_all_gather(dmesh, op):
  """Log-P ppermute tree scan == one-collective all_gather scan == numpy."""
  rng = np.random.default_rng(5)
  vals = rng.integers(1, 4, size=(P, 3)).astype(np.float64)
  x = jnp.asarray(vals)
  got_t = np.asarray(spmd_map(
      lambda v: pscan(v, op, 'x', method='tree'), dmesh, 'x')(x))
  got_g = np.asarray(spmd_map(
      lambda v: pscan(v, op, 'x', method='all_gather'), dmesh, 'x')(x))
  np_op = {jnp.add: np.add, jnp.multiply: np.multiply,
           jnp.maximum: np.maximum, jnp.minimum: np.minimum}[op]
  fi = np.finfo(np.float64)
  unit = {jnp.add: 0.0, jnp.multiply: 1.0, jnp.maximum: fi.min,
          jnp.minimum: fi.max}[op]
  expect = np.empty_like(vals)
  acc = np.full(vals.shape[1:], unit)
  for i in range(P):
    expect[i] = acc
    acc = np_op(acc, vals[i])
  np.testing.assert_allclose(got_t, expect, atol=0)
  np.testing.assert_allclose(got_g, expect, atol=0)


def test_tree_pscan_with_reduction_non_power_of_two():
  """Tree scan on a 5-device (non-power-of-2) submesh + reduction."""
  dm5 = device_mesh('x', 5)
  x = jnp.arange(1.0, 6.0)
  scan, red = spmd_map(
      lambda v: pscan(v, jnp.add, 'x', reduction=True, method='tree'),
      dm5, 'x')(x)
  np.testing.assert_allclose(np.asarray(scan), [0, 1, 3, 6, 10])
  np.testing.assert_allclose(np.asarray(red), np.full(5, 15.0))


def test_pscan_auto_picks_tree_for_large_payloads(dmesh):
  big = jnp.ones((P, 5000))
  out = np.asarray(spmd_map(
      lambda v: pscan(v, jnp.add, 'x'), dmesh, 'x')(big))
  np.testing.assert_allclose(out, np.arange(P)[:, None]
                             * np.ones((1, 5000)))
