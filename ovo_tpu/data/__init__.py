from .datasets import BaseDataset, get_dataset  # noqa: F401
from .masks import PrecomputedMaskSource  # noqa: F401
