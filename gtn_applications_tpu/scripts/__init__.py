from . import build_transitions, load_arpa, make_wordpieces, wordpiece
