#!/usr/bin/env python
"""Thin launcher for `fgvc_tpu.cli.doctor` (environment checks; installed
console script is `fgvc-doctor`)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fgvc_tpu.cli.doctor import main

if __name__ == "__main__":
    main()
