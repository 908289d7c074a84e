from .amg import AutomaticMaskSource, build_sam_mask_source  # noqa: F401
from .model import SAMConfig, SAMModel  # noqa: F401
