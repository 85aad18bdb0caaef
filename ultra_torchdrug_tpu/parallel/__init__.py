from .mesh import current_mesh, make_mesh, use_mesh
from .sharded_rspmm import sharded_rspmm, sharded_rspmm_pallas
from . import distributed
