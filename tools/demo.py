#!/usr/bin/env python
"""Thin launcher for `fgvc_tpu.cli.demo` (kept so the reference-style
`python tools/demo.py ...` invocation works from a source checkout without
installing the package; the installed console script is `fgvc-demo`)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fgvc_tpu.cli.demo import main

if __name__ == "__main__":
    main()
