from .mesh import current_mesh, make_mesh, use_mesh
from .ring_rspmm import build_ring_rspmm_inputs, ring_rspmm
from .sharded_rspmm import sharded_rspmm, sharded_rspmm_pallas
from . import distributed
