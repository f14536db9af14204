from .ctc import CTC
from .asg import ASG, pack_replabels, unpack_replabels, asg_viterbi_decode
