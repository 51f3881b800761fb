#!/usr/bin/env python
"""Generate a synthetic 150^3 test volume (stand-in for the reference's
datasets/test_vol.npy turbulence crop) plus a 255^3 'mhd-like' volume.

Multi-scale smooth fields with localized vortical structure — similar spectral
character to the turbulence/MHD datasets the reference trains on.
"""

import os

import numpy as np


def synth_volume(n: int, seed: int = 0, octaves: int = 4) -> np.ndarray:
    rng = np.random.default_rng(seed)
    x, y, z = np.meshgrid(*[np.linspace(-1, 1, n)] * 3, indexing='ij')
    vol = np.zeros((n, n, n), dtype=np.float64)
    for o in range(octaves):
        f = 2.0 ** o
        amp = 0.5 ** o
        px, py, pz = rng.uniform(0, 2 * np.pi, 3)
        ax, ay, az = rng.uniform(1.0, 3.0, 3)
        vol += amp * (np.sin(ax * f * np.pi * x + px)
                      * np.cos(ay * f * np.pi * y + py)
                      * np.sin(az * f * np.pi * z + pz))
    # localized vortex-like blob
    r2 = x ** 2 + y ** 2 + z ** 2
    vol += 1.5 * np.exp(-8 * r2) * np.sin(12 * np.arctan2(y, x + 1e-9))
    return vol.astype(np.float32)


if __name__ == '__main__':
    here = os.path.join(os.path.dirname(__file__), '..', 'datasets')
    os.makedirs(here, exist_ok=True)
    np.save(os.path.join(here, 'test_vol.npy'), synth_volume(150, seed=0))
    print('wrote datasets/test_vol.npy (150^3)')
    np.save(os.path.join(here, 'mhd_like.npy'), synth_volume(255, seed=1,
                                                             octaves=6))
    print('wrote datasets/mhd_like.npy (255^3)')
