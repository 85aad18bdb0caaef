from .rspmm import generalized_rspmm
from .match import edges_in_patterns, tail_truth_mask, head_truth_mask
from .sampling import sample_from_mask, strict_negatives
from . import variadic
