from .masks import mask_nms, masks_to_seg_map  # noqa: F401
from .similarity import (clip_cosine_similarity, fuse_clips,  # noqa: F401
                         siglip_similarity)
