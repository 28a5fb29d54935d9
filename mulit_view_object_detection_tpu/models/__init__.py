from . import losses  # noqa: F401
from .detector import MaskRCNN, make_dummy_batch  # noqa: F401
from .fpn import FPN  # noqa: F401
from .fusion import ConvLSTM3D, DepthCollapse, GridFusion  # noqa: F401
from .heads import ClassifierHead, MaskHead  # noqa: F401
from .resnet import ResNet  # noqa: F401
from .rpn import RPNHead  # noqa: F401
from .transformer import ViewFusionTransformer  # noqa: F401
