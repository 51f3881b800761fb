"""Volume IO, sampling geometry, cvol format, VTK export."""

import os
import struct

import numpy as np
import pytest

from latent_feature_grid_compression_tpu.data.volume import (
    load_volume, normalize_volume, VolumeMeta, lattice_coords)
from latent_feature_grid_compression_tpu.data.cvol import read_cvol, write_cvol
from latent_feature_grid_compression_tpu.eval.vtk import write_vti

REF_CVOL = '/root/reference/datasets/RichtmyerMeshkov/ppm-t0020.cvol'


def test_normalize_volume():
    v = np.array([0.0, 5.0, 10.0])
    out = normalize_volume(v, 0.0, 10.0, -1.0, 1.0)
    np.testing.assert_allclose(out, [-1.0, 0.0, 1.0])


def test_load_npy(tmp_path):
    vol = np.random.default_rng(0).uniform(3, 7, (8, 9, 10)).astype(np.float32)
    p = str(tmp_path / 'v.npy')
    np.save(p, vol)
    out = load_volume(p)
    assert out.shape == (8, 9, 10)
    assert out.min() == pytest.approx(-1.0) and out.max() == pytest.approx(1.0)


def test_load_h5(tmp_path):
    import h5py
    vol = np.random.default_rng(1).uniform(size=(1, 6, 7, 8)).astype(np.float32)
    p = str(tmp_path / 'v.h5')
    with h5py.File(p, 'w') as f:
        f.create_dataset('data', data=vol)
    out = load_volume(p)
    assert out.shape == (6, 7, 8)  # squeezed (IndexDataset.py:28)


def test_cvol_roundtrip(tmp_path):
    vol = (np.random.default_rng(2).uniform(0, 255, (16, 12, 10))
           .astype(np.uint8))
    p = str(tmp_path / 'v.cvol')
    write_cvol(p, vol)
    back = read_cvol(p)
    np.testing.assert_array_equal(back, vol)

    volf = np.random.default_rng(3).standard_normal((5, 6, 7)).astype(np.float32)
    p2 = str(tmp_path / 'vf.cvol')
    write_cvol(p2, volf)
    np.testing.assert_array_equal(read_cvol(p2), volf)


@pytest.mark.skipif(not os.path.exists(REF_CVOL), reason='no reference cvol')
def test_read_reference_cvol():
    """Decode the real (streaming-LZ4 compressed) RichtmyerMeshkov volume."""
    vol = read_cvol(REF_CVOL)
    assert vol.shape == (256, 256, 256)
    assert vol.dtype == np.uint8
    assert 50 < float(vol.mean()) < 60  # plausible density field


def test_volume_meta_scales():
    meta = VolumeMeta((255, 255, 128))
    np.testing.assert_allclose(meta.max_idx, [254, 254, 127])
    np.testing.assert_allclose(meta.scales, [1.0, 1.0, 127 / 254])
    assert meta.n_voxels == 255 * 255 * 128


def test_lattice_coords_matches_normalize():
    meta = VolumeMeta((4, 5, 6))
    pts = lattice_coords(meta)
    assert pts.shape == (120, 3)
    # first point = index (0,0,0) -> -scales; last = +scales
    np.testing.assert_allclose(pts[0], -meta.scales, atol=1e-6)
    np.testing.assert_allclose(pts[-1], meta.scales, atol=1e-6)
    # row-major order: second point is index (0,0,1)
    raw = np.array([[0, 0, 1]], dtype=np.float32)
    np.testing.assert_allclose(pts[1], meta.normalize_positions(raw)[0], atol=1e-6)


def test_write_vti(tmp_path):
    vol = np.random.default_rng(4).standard_normal((4, 5, 6)).astype(np.float32)
    p = write_vti(str(tmp_path / 'out'), vol)
    assert p.endswith('.vti') and os.path.exists(p)
    with open(p, 'rb') as f:
        data = f.read()
    assert data.startswith(b'<?xml')
    assert b'AppendedData' in data
    # payload length prefix == nbytes
    idx = data.index(b'_', data.index(b'encoding="raw"')) + 1
    (n,) = struct.unpack('<Q', data[idx:idx + 8])
    assert n == vol.size * 4
    payload = np.frombuffer(data[idx + 8: idx + 8 + n], dtype='<f4')
    np.testing.assert_allclose(payload.reshape(6, 5, 4).transpose(2, 1, 0), vol)
