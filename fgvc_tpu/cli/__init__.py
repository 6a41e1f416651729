"""Command-line entry points (installed as fgvc-train / fgvc-test /
fgvc-demo / fgvc-export; also runnable as ``python tools/<name>.py`` from a
source checkout).  Mirrors the reference's tools/ CLI surface
(/root/reference/tools/train.py, test.py)."""
