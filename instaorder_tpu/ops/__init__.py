from . import morphology, resize
from .morphology import binary_dilation, binary_erosion, bordering_matrix
from .resize import resize_nearest

# NOTE: the `resize.resize` convenience function is intentionally not
# re-exported at package level — it would shadow the `ops.resize` submodule.
