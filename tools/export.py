#!/usr/bin/env python
"""Thin launcher for `fgvc_tpu.cli.export` (kept so the reference-style
`python tools/export.py ...` invocation works from a source checkout without
installing the package; the installed console script is `fgvc-export`)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fgvc_tpu.cli.export import main

if __name__ == "__main__":
    main()
