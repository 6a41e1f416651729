#!/usr/bin/env python
"""Thin launcher for `fgvc_tpu.cli.serve` (HTTP tracking service; installed
console script is `fgvc-serve`)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fgvc_tpu.cli.serve import main

if __name__ == "__main__":
    main()
