#!/usr/bin/env python
"""Top-level training entry point (parity with the reference's
`python train.py --config X.json`)."""
from gtn_applications_tpu.train import main

if __name__ == "__main__":
    main()
