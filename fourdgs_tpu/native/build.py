"""Build the native helpers: `python -m fourdgs_tpu.native.build`."""
from __future__ import annotations

import os
import shutil
import subprocess
import sys


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    src_dir = os.path.normpath(os.path.join(here, "..", "..", "native"))
    out = os.path.join(here, "libcolmap_native.so")
    if shutil.which("cmake") and shutil.which("ninja"):
        build = os.path.join(src_dir, "build")
        os.makedirs(build, exist_ok=True)
        subprocess.run(["cmake", "-G", "Ninja", ".."], cwd=build, check=True)
        subprocess.run(["ninja"], cwd=build, check=True)
    else:
        subprocess.run(
            ["g++", "-O3", "-fPIC", "-shared", "-std=c++17",
             os.path.join(src_dir, "colmap_native.cpp"), "-o", out],
            check=True)
    assert os.path.exists(out), out
    print(f"built {out}")


if __name__ == "__main__":
    main()
