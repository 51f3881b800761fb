"""Minimal VTK XML ImageData (.vti) writer.

From-scratch replacement for ``pyevtk.hl.imageToVTK`` (unavailable in this
image; reference call site visualization/OutputToVTK.py:75-77).  Writes a
point-data scalar field in appended-raw encoding, readable by ParaView/VisIt.
"""

from __future__ import annotations

import struct

import numpy as np


def write_vti(filename: str, field: np.ndarray, name: str = 'sf',
              origin=(0.0, 0.0, 0.0), spacing=(1.0, 1.0, 1.0)) -> str:
    """Write (X, Y, Z) scalar field as point data; returns the output path."""
    if not filename.endswith('.vti'):
        filename = filename + '.vti'
    field = np.asarray(field)
    if field.ndim != 3:
        raise ValueError('expected a 3-D scalar field')
    nx, ny, nz = field.shape
    # VTK stores x-fastest
    payload = np.ascontiguousarray(field.transpose(2, 1, 0), dtype=np.float32).tobytes()
    blob = struct.pack('<Q', len(payload)) + payload

    header = f'''<?xml version="1.0"?>
<VTKFile type="ImageData" version="1.0" byte_order="LittleEndian" header_type="UInt64">
  <ImageData WholeExtent="0 {nx - 1} 0 {ny - 1} 0 {nz - 1}" Origin="{origin[0]} {origin[1]} {origin[2]}" Spacing="{spacing[0]} {spacing[1]} {spacing[2]}">
    <Piece Extent="0 {nx - 1} 0 {ny - 1} 0 {nz - 1}">
      <PointData Scalars="{name}">
        <DataArray type="Float32" Name="{name}" NumberOfComponents="1" format="appended" offset="0"/>
      </PointData>
      <CellData/>
    </Piece>
  </ImageData>
  <AppendedData encoding="raw">
   _'''
    footer = '''
  </AppendedData>
</VTKFile>
'''
    with open(filename, 'wb') as f:
        f.write(header.encode())
        f.write(blob)
        f.write(footer.encode())
    return filename
