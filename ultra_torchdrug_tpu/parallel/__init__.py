from .mesh import current_mesh, make_mesh, use_mesh
from .ring_rspmm import build_ring_rspmm_inputs, ring_rspmm
from .sharded_rspmm import partitioned_rspmm_pallas, sharded_rspmm
from . import distributed
