#!/usr/bin/env python3
"""Split a list file into N parts (reference scripts/split_files.py) —
used to shard prep jobs across workers.

Usage: python scripts/split_files.py --input list.txt --n 4
"""
import argparse
import os


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True)
    parser.add_argument("--n", type=int, required=True)
    args = parser.parse_args(argv)

    with open(args.input) as f:
        lines = [line.rstrip() for line in f if line.strip()]
    base, ext = os.path.splitext(args.input)
    for i in range(args.n):
        part = lines[i :: args.n]
        out = f"{base}_{i:02d}{ext}"
        with open(out, "w") as f:
            f.write("\n".join(part) + "\n")
        print(f"{out}: {len(part)} entries")


if __name__ == "__main__":
    main()
