from .graph import (
    EPSILON, Graph, linear_graph, load, loadtxt, save, savetxt, write_dot,
)
from .ops import (
    compose, equal, forward_score, intersect, isomorphic, project_input,
    project_output, remove, trim, viterbi_path, viterbi_score,
)
from .compile import CompiledGraph, compile_acceptor, stack_arc_tables, to_arc_table
