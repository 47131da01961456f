"""Binary MSH 4.1 reading vs the ASCII twin of the same mesh.

The reference reads binary MSH via meshio (``swirl_fem/common/
mesh_reader.py:78``); meshio is absent here, so `utils.gmsh` parses the
binary encoding natively.  Each ASCII fixture is transcoded to binary by
the spec-following converter below and both parses must agree exactly.
(The converter shares this test author's reading of the spec with the
parser, so this validates the binary code path mechanics and
ASCII/binary consistency, not independent spec fidelity.)
"""

import struct

import numpy as np
import pytest

from swirlfem_tpu.utils import gmsh as G

TESTDATA = '/root/reference/swirl_fem/testdata'


def _i4(*v):
  return struct.pack(f'<{len(v)}i', *[int(x) for x in v])


def _szt(*v):
  return struct.pack(f'<{len(v)}q', *[int(x) for x in v])


def _f8(v):
  return struct.pack(f'<{len(v)}d', *[float(x) for x in v])


def to_binary_msh(text: str) -> bytes:
  """Transcodes an ASCII MSH 4.1 file to the binary encoding."""
  sections = G._sections(text)
  out = bytearray()
  out += b'$MeshFormat\n4.1 1 8\n' + _i4(1) + b'\n$EndMeshFormat\n'

  if 'PhysicalNames' in sections:  # stays ASCII in binary files
    body = '\n'.join(l.strip() for l in sections['PhysicalNames'] if l.strip())
    out += b'$PhysicalNames\n' + body.encode() + b'\n$EndPhysicalNames\n'

  if 'Entities' in sections:
    t = G._Tokens(sections['Entities'])
    counts = t.ints(4)
    out += b'$Entities\n' + _szt(*counts)
    for dim, count in enumerate(counts):
      for _ in range(count):
        out += _i4(t.int())
        out += _f8(t.floats(3 if dim == 0 else 6))
        num_phys = t.int()
        out += _szt(num_phys) + _i4(*t.ints(num_phys))
        if dim > 0:
          num_bounding = t.int()
          out += _szt(num_bounding) + _i4(*t.ints(num_bounding))
    out += b'\n$EndEntities\n'

  t = G._Tokens(sections['Nodes'])
  nb, total, mn, mx = t.ints(4)
  out += b'$Nodes\n' + _szt(nb, total, mn, mx)
  for _ in range(nb):
    dim, tag, par, cnt = t.ints(4)
    out += _i4(dim, tag, par) + _szt(cnt)
    out += _szt(*t.ints(cnt))
    for _ in range(cnt):
      out += _f8(t.floats(3))
  out += b'\n$EndNodes\n'

  t = G._Tokens(sections['Elements'])
  nb, tot, mn, mx = t.ints(4)
  out += b'$Elements\n' + _szt(nb, tot, mn, mx)
  for _ in range(nb):
    dim, tag, etype, cnt = t.ints(4)
    out += _i4(dim, tag, etype) + _szt(cnt)
    _, nper = G._ELEM_TYPES[etype]
    for _ in range(cnt):
      out += _szt(*t.ints(1 + nper))
  out += b'\n$EndElements\n'

  if 'Periodic' in sections:
    t = G._Tokens(sections['Periodic'])
    num_links = t.int()
    out += b'$Periodic\n' + _szt(num_links)
    for _ in range(num_links):
      out += _i4(*t.ints(3))
      num_affine = t.int()
      out += _szt(num_affine) + _f8(t.floats(num_affine))
      cnt = t.int()
      out += _szt(cnt)
      for _ in range(cnt):
        out += _szt(*t.ints(2))
    out += b'\n$EndPeriodic\n'
  return bytes(out)


@pytest.mark.parametrize('fname,ndim', [
    ('line1d.msh', 1),
    ('kovasznay.msh', 2),
    ('cube.msh', 3),
    ('periodic_cube.msh', 3),
])
def test_binary_matches_ascii(tmp_path, fname, ndim):
  with open(f'{TESTDATA}/{fname}') as f:
    text = f.read()
  bpath = tmp_path / fname.replace('.msh', '_bin.msh')
  bpath.write_bytes(to_binary_msh(text))

  pm_a = G.read(f'{TESTDATA}/{fname}', ndim=ndim)
  pm_b = G.read(str(bpath), ndim=ndim)

  np.testing.assert_array_equal(pm_b.node_coords, pm_a.node_coords)
  np.testing.assert_array_equal(pm_b.elements, pm_a.elements)
  assert set(pm_b.physical_groups) == set(pm_a.physical_groups)
  for name in pm_a.physical_groups:
    np.testing.assert_array_equal(pm_b.physical_groups[name],
                                  pm_a.physical_groups[name])
  if pm_a.periodic_links is None:
    assert pm_b.periodic_links is None
  else:
    np.testing.assert_array_equal(pm_b.periodic_links, pm_a.periodic_links)


def test_non_ascii_physical_names(tmp_path):
  """UTF-8 physical names parse in both encodings (regression: the byte-
  mode reader briefly decoded with the strict ascii codec)."""
  with open(f'{TESTDATA}/kovasznay.msh') as f:
    text = f.read().replace('"left"', '"entrée"')
  apath = tmp_path / 'utf8.msh'
  apath.write_text(text, encoding='utf-8')
  pm_a = G.read(str(apath), ndim=2)
  assert 'entrée' in pm_a.physical_groups
  bpath = tmp_path / 'utf8_bin.msh'
  bpath.write_bytes(to_binary_msh(text))
  pm_b = G.read(str(bpath), ndim=2)
  assert 'entrée' in pm_b.physical_groups


def test_binary_mesh_finalizes(tmp_path):
  """The binary-parsed periodic mesh survives refine + finalize."""
  with open(f'{TESTDATA}/kovasznay.msh') as f:
    text = f.read()
  bpath = tmp_path / 'kovasznay_bin.msh'
  bpath.write_bytes(to_binary_msh(text))
  pm = G.read(str(bpath), ndim=2)
  mesh = pm.finalize()
  assert mesh.num_nodes == pm.num_nodes


if __name__ == '__main__':
  pytest.main([__file__, '-v'])
