from .coco import AITODDataset, CocoDetDataset  # noqa: F401
from .loader import TrainLoader, EvalLoader  # noqa: F401
