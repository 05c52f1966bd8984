from .resnet import ResNet  # noqa: F401
from .fpn import FPN  # noqa: F401
from .psagg import PSAGG  # noqa: F401
from .fcos_head import FCOSHead  # noqa: F401
from .mil_head import MILHead  # noqa: F401
from .detector import StudentFCOS  # noqa: F401
