from .base import Criterion
from .ctc import CTC
from .asg import ASG, create_transitions_graph, pack_replabels, unpack_replabels
from .stc import STC
from .transducer import (
    Transducer,
    make_chain_graph,
    make_lexicon_graph,
    make_token_graph,
    make_transitions_graph,
)
