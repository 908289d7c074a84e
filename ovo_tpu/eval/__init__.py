from .semantics import eval_semantics, iou_acc_from_confmat  # noqa: F401
from .transfer import match_labels_to_vtx  # noqa: F401
