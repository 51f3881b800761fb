"""Volume IO + sampling geometry (reference: data/IndexDataset.py).

Loads .npy / .h5 / .cvol scalar volumes, normalizes to [-1, 1] over the global
min/max, and exposes the sampling geometry (resolution, anisotropy scales,
index<->normalized-coordinate maps).  Unlike the reference there is no
DataLoader: training positions are sampled on-device inside the jitted train
step (see train/trainer.py), so this module is host-side metadata only.
"""

from __future__ import annotations

import dataclasses

import numpy as np


def normalize_volume(volume, min_v, max_v, min_n, max_n):
    """Map [min_v, max_v] -> [min_n, max_n] (IndexDataset.py:7-8)."""
    return (max_n - min_n) * ((volume - min_v) / (max_v - min_v)) + min_n


def load_volume(filepath: str) -> np.ndarray:
    """Load + [-1,1]-normalize a volume from .npy/.h5/.cvol (IndexDataset.py:39-47)."""
    if filepath.endswith('.npy'):
        vol = np.load(filepath).astype(np.float32)
    elif filepath.endswith('.h5'):
        import h5py
        with h5py.File(filepath, 'r') as f:
            key = list(f.keys())[0]
            vol = np.squeeze(f[key][()]).astype(np.float32)
    elif filepath.endswith('.cvol'):
        from .cvol import read_cvol
        vol = read_cvol(filepath).astype(np.float32)
    else:
        raise ValueError(f"unsupported volume format: {filepath}")
    vol = np.asarray(vol, dtype=np.float32)
    return normalize_volume(vol, vol.min(), vol.max(), -1.0, 1.0).astype(np.float32)


@dataclasses.dataclass(frozen=True)
class VolumeMeta:
    """Sampling geometry of a volume (IndexDataset.py:50-66)."""

    resolution: tuple  # (X, Y, Z)

    @property
    def res(self) -> np.ndarray:
        return np.asarray(self.resolution, dtype=np.float32)

    @property
    def n_voxels(self) -> int:
        return int(np.prod(self.resolution))

    @property
    def min_idx(self) -> np.ndarray:
        return np.zeros(3, dtype=np.float32)

    @property
    def max_idx(self) -> np.ndarray:
        return self.res - 1.0

    @property
    def scales(self) -> np.ndarray:
        """Anisotropy scales: max_idx / max(max_idx) (IndexDataset.py:64-66)."""
        return self.max_idx / self.max_idx.max()

    def normalize_positions(self, raw: np.ndarray) -> np.ndarray:
        """Integer lattice positions -> scaled [-1,1] net coords
        (IndexDataset.py:92-96)."""
        norm = normalize_volume(raw, self.min_idx[None], self.max_idx[None],
                                -1.0, 1.0)
        return self.scales[None] * norm


def lattice_coords(meta: VolumeMeta) -> np.ndarray:
    """All (X*Y*Z, 3) normalized+scaled lattice coordinates, row-major.

    Equivalent to the per-tile coordinate construction of the reference's
    tiled evaluation (visualization/OutputToVTK.py:25-37), which reduces to
    the full normalized lattice.
    """
    X, Y, Z = meta.resolution
    axes = [np.linspace(0.0, 1.0, n, dtype=np.float32) * 2.0 - 1.0
            for n in (X, Y, Z)]
    gx, gy, gz = np.meshgrid(*axes, indexing='ij')
    pts = np.stack([gx, gy, gz], axis=-1).reshape(-1, 3)
    return pts * meta.scales[None]
