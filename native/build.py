#!/usr/bin/env python
"""Build the native packer shared library (g++, no external deps)."""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "packer.cc")
OUT = os.path.join(HERE, "libllmmil_packer.so")


def build() -> str:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-std=c++17", SRC, "-o", OUT]
    subprocess.check_call(cmd)
    return OUT


if __name__ == "__main__":
    print(build())
