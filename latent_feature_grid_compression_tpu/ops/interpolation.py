"""Trilinear interpolation kernels (XLA gather path).

Two interpolators, matching the two call sites of the reference:

1. :func:`grid_sample_3d` — feature-grid fetch with *exactly* the semantics of
   ``torch.nn.functional.grid_sample(mode='bilinear', align_corners=False,
   padding_mode='zeros')`` as used at reference model/Feature_Grid_Model.py:63.
   Notably torch's grid coordinate order is (x, y, z) = (W, H, D): coordinate 0
   indexes the *last* spatial axis of the input.

2. :func:`trilinear_interpolate` — ground-truth volume fetch on raw index
   coordinates, semantics of reference data/Interpolation.py:8-44 (neurcomp
   style): floor/ceil corner gather with a degenerate-cell guard, so integer
   coordinates return the exact voxel value.

Both are pure jnp (gathers + FMA blends); XLA fuses the 8-corner blend.  A
fused Pallas variant lives in ops/pallas_kernels.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_sample_3d(features: jax.Array, coords: jax.Array) -> jax.Array:
    """Sample a 3-D multi-channel grid at normalized points.

    Args:
      features: (C, D, H, W) feature volume.
      coords: (N, 3) points in [-1, 1]; coords[:, 0] indexes W (the last
        axis), coords[:, 1] indexes H, coords[:, 2] indexes D — torch
        ``grid_sample`` convention.

    Returns:
      (N, C) interpolated features; out-of-range corners contribute zero
      (padding_mode='zeros').
    """
    C, D, H, W = features.shape
    sizes = jnp.asarray([W, H, D], dtype=coords.dtype)

    # Channel-minor flat layout: each corner fetch is one contiguous C-float
    # row — far better TPU gather locality than C-major strided access, and
    # the backward pass becomes a row-wise scatter-add.
    flat = jnp.transpose(features, (1, 2, 3, 0)).reshape(D * H * W, C)

    # align_corners=False: x_pix = ((x + 1) * size - 1) / 2
    pix = ((coords + 1.0) * sizes - 1.0) * 0.5          # (N, 3) in pixel space
    lo = jnp.floor(pix)
    frac = pix - lo                                      # in [0, 1)
    lo = lo.astype(jnp.int32)

    fx, fy, fz = frac[:, 0], frac[:, 1], frac[:, 2]

    out = 0.0
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                ix = lo[:, 0] + dx
                iy = lo[:, 1] + dy
                iz = lo[:, 2] + dz
                valid = ((ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
                         & (iz >= 0) & (iz < D))
                ixc = jnp.clip(ix, 0, W - 1)
                iyc = jnp.clip(iy, 0, H - 1)
                izc = jnp.clip(iz, 0, D - 1)
                rows = flat[(izc * H + iyc) * W + ixc]   # (N, C) row gather
                w = ((fx if dx else 1.0 - fx)
                     * (fy if dy else 1.0 - fy)
                     * (fz if dz else 1.0 - fz))
                out = out + rows * (w * valid)[:, None]
    return out                                           # (N, C)


def trilinear_interpolate(volume: jax.Array, points: jax.Array,
                          min_bb: jax.Array, max_bb: jax.Array,
                          res: jax.Array) -> jax.Array:
    """Trilinear interpolation of a scalar volume at raw index coordinates.

    Matches reference data/Interpolation.py:8-44: points are mapped onto the
    index lattice, corners gathered via floor/ceil, and blended with a
    1e-12 degenerate-cell guard (so exactly-integer points return the voxel
    value with alpha == 0).

    Args:
      volume: (X, Y, Z) scalar field.
      points: (N, 3) coordinates in the [min_bb, max_bb] box.
      min_bb, max_bb, res: (3,) bounding box and resolution.
    """
    normalized = (points - min_bb[None]) / (max_bb - min_bb)[None] * (res[None] - 1.0)
    lo = jnp.floor(normalized)
    hi = jnp.ceil(normalized)
    diff = jnp.maximum(hi - lo, 1e-12)
    alpha = ((normalized - lo) / diff).astype(volume.dtype)
    one_alpha = 1.0 - alpha

    loi = lo.astype(jnp.int32)
    hii = hi.astype(jnp.int32)

    def fetch(ix, iy, iz):
        return volume[ix, iy, iz]

    x0, y0, z0 = loi[:, 0], loi[:, 1], loi[:, 2]
    x1, y1, z1 = hii[:, 0], hii[:, 1], hii[:, 2]
    ax, ay, az = alpha[:, 0], alpha[:, 1], alpha[:, 2]
    bx, by, bz = one_alpha[:, 0], one_alpha[:, 1], one_alpha[:, 2]

    x_y0z0 = bx * fetch(x0, y0, z0) + ax * fetch(x1, y0, z0)
    x_y1z0 = bx * fetch(x0, y1, z0) + ax * fetch(x1, y1, z0)
    x_y0z1 = bx * fetch(x0, y0, z1) + ax * fetch(x1, y0, z1)
    x_y1z1 = bx * fetch(x0, y1, z1) + ax * fetch(x1, y1, z1)

    y_z0 = by * x_y0z0 + ay * x_y1z0
    y_z1 = by * x_y0z1 + ay * x_y1z1
    return bz * y_z0 + az * y_z1


def gather_rows(vol2d: jax.Array, y_size: int,
                int_points: jax.Array) -> jax.Array:
    """Z-row gather + lane select on a pre-flattened (X*Y, Z) volume.

    NOTE the reshape placement is perf-sensitive and counter-intuitive
    (measured r5, full-step A/B on v5e): reshaping INSIDE the scanned step
    (a fresh ~89 us copy every step) is the fastest formulation — gathering
    from the loop-invariant HBM buffer instead costs 308 us vs 91 us from
    the fresh copy, and direct 3-D indexing is slower still
    (1.370 / 1.478 / 1.536 ms/step).  Callers should pass the 3-D volume
    through and reshape at the gather site.
    """
    Z = vol2d.shape[1]
    rows = vol2d[int_points[:, 0] * y_size + int_points[:, 1]]
    sel = (jax.lax.broadcasted_iota(jnp.int32, (1, Z), 1)
           == int_points[:, 2][:, None])
    return jnp.sum(jnp.where(sel, rows, 0.0), axis=1)


def gather_volume(volume: jax.Array, int_points: jax.Array) -> jax.Array:
    """Exact voxel fetch for integer lattice points.

    Fast path for the training loop: the reference's position sampler only
    emits integer lattice coordinates (data/IndexDataset.py:90-96), for which
    :func:`trilinear_interpolate` degenerates to a single gather (alpha == 0).
    Equality of the two paths is asserted in tests/test_interpolation.py.

    Implementation: gather whole z-rows (one contiguous (Z,) DMA per sample —
    TPU gathers are row-granular anyway) and select the lane with an iota
    compare + masked sum on the VPU.  Measured ~2-4x faster than the
    per-element gather ``volume[x, y, z]`` on v5e (0.12-0.25 ms vs 0.48 ms
    for 32k points on a 255^3 volume).
    """
    X, Y, Z = volume.shape
    return gather_rows(volume.reshape(X * Y, Z), Y, int_points)


def generate_regular_grid_interpolator(volume):
    """scipy RegularGridInterpolator over the index lattice (reference:
    data/Interpolation.py:93-99; unused by training, provided for parity)."""
    import numpy as _np
    from scipy.interpolate import RegularGridInterpolator
    vol = _np.asarray(volume)
    axes = [_np.arange(s, dtype=_np.float64) for s in vol.shape]
    return RegularGridInterpolator(tuple(axes), vol)


def finite_difference_gradient(volume, points, min_bb, max_bb, res, scale=None):
    """Central-difference gradient via offset re-interpolation.

    Mirrors reference data/Interpolation.py:47-85 (imported by the reference
    training loop but unused in the shipped loss; provided for completeness).
    """
    step = (max_bb - min_bb) / (res - 1.0)
    grads = []
    for axis in range(3):
        offset = jnp.zeros((3,), dtype=points.dtype).at[axis].set(step[axis])
        p_neg = points - offset[None]
        p_pos = points + offset[None]
        p_neg = p_neg.at[:, axis].set(jnp.maximum(p_neg[:, axis], min_bb[axis]))
        p_pos = p_pos.at[:, axis].set(jnp.minimum(p_pos[:, axis], max_bb[axis]))
        s = 1.0 if scale is None else scale[axis]
        denom = 2.0 * s * (p_pos[:, axis] - p_neg[:, axis]) / (max_bb[axis] - min_bb[axis])
        deriv = (trilinear_interpolate(volume, p_pos, min_bb, max_bb, res)
                 - trilinear_interpolate(volume, p_neg, min_bb, max_bb, res)) / denom
        grads.append(deriv)
    return jnp.stack(grads, axis=1)
