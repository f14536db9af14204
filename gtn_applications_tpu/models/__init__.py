from .rnn import RNN
from .tds import TDS, TDSBlock, InstanceNorm
from .tds2d import TDS2d, TDSBlock2d, TDS2dTransducer
