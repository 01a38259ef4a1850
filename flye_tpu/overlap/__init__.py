from flye_tpu.overlap.structs import Overlap
from flye_tpu.overlap.engine import OverlapEngine, OverlapStore
