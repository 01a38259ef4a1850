from flye_tpu.assemble.chimera import ChimeraDetector
from flye_tpu.assemble.extender import Extender, ContigPath
from flye_tpu.assemble.driver import assemble_disjointigs
