#!/usr/bin/env python
"""Thin launcher for `fgvc_tpu.cli.reproduce` (one-command reproduction of
the reference's published benchmark numbers; installed console script is
`fgvc-reproduce`)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fgvc_tpu.cli.reproduce import main

if __name__ == "__main__":
    main()
