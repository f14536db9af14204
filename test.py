#!/usr/bin/env python
"""Top-level evaluation entry point (parity with the reference's
`python test.py --config X.json --checkpoint_path P --split S`)."""
from gtn_applications_tpu.test import main

if __name__ == "__main__":
    main()
