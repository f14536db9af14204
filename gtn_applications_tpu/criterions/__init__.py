from .ctc import CTC
