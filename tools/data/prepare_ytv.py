#!/usr/bin/env python
"""Prepare YouTube-VOS frames for training: resize to short-side 256.

Equivalent of the reference's offline YTV preparation that produces
``train/JPEGImages_s256`` (the path the mixed training config reads,
/root/reference/configs/train/mixed_train_res18_d1_l2_rec_ytv_fly.py:100).

    python tools/data/prepare_ytv.py --root <YouTube-VOS>/train/JPEGImages \
        --out <YouTube-VOS>/train/JPEGImages_s256 [--size 256]
"""

import argparse
import glob
import os


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--root", required=True, help="train/JPEGImages dir")
    parser.add_argument("--out", required=True)
    parser.add_argument("--size", type=int, default=256)
    parser.add_argument("--quality", type=int, default=95)
    args = parser.parse_args()

    import cv2

    n = 0
    for vdir in sorted(glob.glob(os.path.join(args.root, "*"))):
        if not os.path.isdir(vdir):
            continue
        vid = os.path.basename(vdir)
        out_dir = os.path.join(args.out, vid)
        os.makedirs(out_dir, exist_ok=True)
        for p in sorted(glob.glob(os.path.join(vdir, "*.jpg"))):
            img = cv2.imread(p)
            h, w = img.shape[:2]
            s = args.size / min(h, w)
            img = cv2.resize(
                img,
                (int(round(w * s)), int(round(h * s))),
                interpolation=cv2.INTER_AREA if s < 1 else cv2.INTER_LINEAR,
            )
            cv2.imwrite(
                os.path.join(out_dir, os.path.basename(p)),
                img,
                [cv2.IMWRITE_JPEG_QUALITY, args.quality],
            )
        n += 1
    print(f"resized {n} videos into {args.out}")


if __name__ == "__main__":
    main()
