#!/usr/bin/env python3
"""Build the gennerf_native shared library (host-side C++ kernels).

Usage: python native/build.py
"""
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def build() -> str:
    src = os.path.join(HERE, "gennerf_native.cpp")
    out = os.path.join(HERE, "libgennerf_native.so")
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        src, "-o", out,
    ]
    print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return out


if __name__ == "__main__":
    path = build()
    print(f"built {path}")
    sys.exit(0)
