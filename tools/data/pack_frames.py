#!/usr/bin/env python
"""Pack video frame directories into fgpack stores for fast native reads.

Equivalent of /root/reference/tools/data/create_lmdb.py: turns per-video
JPEG directories into one flat mmap-able store per video plus a json index,
served by the C++ threaded reader (csrc/fgpack.cpp).

    python tools/data/pack_frames.py --root <JPEGImages dir> --out packs/ \
        [--size 256]
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(
    0,
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--root", required=True, help="dir of video subdirs")
    parser.add_argument("--out", required=True)
    parser.add_argument("--size", type=int, default=0, help="resize shorter side")
    parser.add_argument(
        "--codec",
        choices=("raw", "jpeg"),
        default="raw",
        help="record codec: raw uint8 blobs, or JPEG (~13x smaller; the "
        "native reader decodes them in its thread pool)",
    )
    parser.add_argument(
        "--quality", type=int, default=95, help="JPEG quality (codec=jpeg)"
    )
    args = parser.parse_args()

    import cv2

    from fgvc_tpu.data_io.fgpack import build_library, write_fgpack

    build_library()
    os.makedirs(args.out, exist_ok=True)
    index = {}
    vdirs = sorted(
        d for d in glob.glob(os.path.join(args.root, "*")) if os.path.isdir(d)
    )
    for vdir in vdirs:
        name = os.path.basename(vdir)
        paths = sorted(
            glob.glob(os.path.join(vdir, "*.jpg"))
            + glob.glob(os.path.join(vdir, "*.png"))
        )
        if not paths:
            continue
        frames = []
        for p in paths:
            img = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
            if args.size:
                h, w = img.shape[:2]
                s = args.size / min(h, w)
                img = cv2.resize(img, (int(round(w * s)), int(round(h * s))))
            frames.append(img)
        out_path = os.path.join(args.out, f"{name}.fgpack")
        n = write_fgpack(out_path, frames, codec=args.codec, quality=args.quality)
        index[name] = {"path": f"{name}.fgpack", "frames": n}
        print(f"{name}: {n} frames")
    with open(os.path.join(args.out, "index.json"), "w") as f:
        json.dump(index, f, indent=1)
    print(f"packed {len(index)} videos to {args.out}")


if __name__ == "__main__":
    main()
