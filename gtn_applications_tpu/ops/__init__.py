from . import lattice, semiring, sparse
from .semiring import NEG
from .sparse import ArcTable
