from .rspmm import (
    generalized_rspmm,
    generalized_rspmm_addsq,
    generalized_rspmm_maxmin,
)
from .match import edges_in_patterns, tail_truth_mask, head_truth_mask
from .sampling import sample_from_mask, strict_negatives
from . import variadic
