from .base import Criterion
from .ctc import CTC
from .asg import ASG, pack_replabels, unpack_replabels
