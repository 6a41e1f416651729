#!/usr/bin/env python
"""Split a monolithic TAP-Vid pickle into per-video shards.

Equivalent of /root/reference/tools/data/split_pickle.py: the DeepMind
release ships one pickle per subset; the eval loader wants one ``*.pkl``
per video.

    python tools/data/split_tapvid.py --input tapvid_davis.pkl --out data_split/
"""

import argparse
import os
import pickle


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True)
    parser.add_argument("--out", required=True)
    args = parser.parse_args()

    with open(args.input, "rb") as f:
        data = pickle.load(f)
    os.makedirs(args.out, exist_ok=True)

    if isinstance(data, dict):
        items = data.items()
    else:  # kinetics-style list
        items = ((f"{i:05d}", rec) for i, rec in enumerate(data))

    n = 0
    for name, record in items:
        path = os.path.join(args.out, f"{name}.pkl")
        with open(path, "wb") as f:
            pickle.dump(record, f)
        n += 1
    print(f"wrote {n} shards to {args.out}")


if __name__ == "__main__":
    main()
