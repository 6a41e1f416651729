#!/usr/bin/env python
"""Thin launcher for `fgvc_tpu.cli.train` (kept so the reference-style
`python tools/train.py ...` invocation works from a source checkout without
installing the package; the installed console script is `fgvc-train`)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fgvc_tpu.cli.train import main

if __name__ == "__main__":
    main()
