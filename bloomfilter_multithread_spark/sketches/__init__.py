"""Pure-numpy mergeable sketches. No Spark imports here — unit-testable standalone."""

from .ams import AMSSketch
from .base import MergeableSketch, merge_all, sketch_class
from .bloom import BloomSketch, ReferenceBloom, optimal_params
from .cbf import CBFSketch
from .cms import CMSSketch
from .hashing import double_hash_indices, splitmix64, to_u64, xorshift32_batch, xorshift32_scalar
from .hdr import HDRSketch
from .hll import HLLSketch
from .kll import KLLSketch
from .kmv import KMVSketch
from .mg import MGSketch
from .tdigest import TDigestSketch

__all__ = [
    "MergeableSketch",
    "merge_all",
    "sketch_class",
    "AMSSketch",
    "BloomSketch",
    "ReferenceBloom",
    "optimal_params",
    "CBFSketch",
    "CMSSketch",
    "HDRSketch",
    "HLLSketch",
    "KLLSketch",
    "KMVSketch",
    "MGSketch",
    "TDigestSketch",
    "double_hash_indices",
    "splitmix64",
    "to_u64",
    "xorshift32_batch",
    "xorshift32_scalar",
]
