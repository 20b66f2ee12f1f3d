from .sparse_encoder import SparseEncoderHD
from .second3d import SECOND3D, SECOND3DFPN
from .head import Uni3DETRHead
from .detector import Uni3DETR
