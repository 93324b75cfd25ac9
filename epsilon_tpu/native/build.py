"""Build the native host library: ``python -m epsilon_tpu.native.build``."""

import os
import subprocess
import sys

SRC_DIR = os.path.dirname(__file__)
SOURCES = ["tv1d.cc", "ordering.cc"]
OUT = os.path.join(SRC_DIR, "libepsilon_native.so")


def build(verbose: bool = True) -> str:
    cmd = ["g++", "-O3", "-fPIC", "-shared", "-std=c++17",
           "-o", OUT] + [os.path.join(SRC_DIR, s) for s in SOURCES]
    if verbose:
        print(" ".join(cmd))
    subprocess.check_call(cmd)
    return OUT


if __name__ == "__main__":
    build()
    print(f"built {OUT}")
    sys.exit(0)
