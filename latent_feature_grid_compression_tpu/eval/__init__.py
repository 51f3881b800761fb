from .reconstruct import field_from_net, deviation_statistics, tiled_net_out
from .vtk import write_vti
