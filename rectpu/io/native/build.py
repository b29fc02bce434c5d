"""Build the native IO library: ``python -m rectpu.io.native.build``.

Plain g++, no external dependencies; output lands next to this file as
librectpu_io.so and is picked up automatically by rectpu.io.native.
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

HERE = Path(__file__).parent
SOURCES = ["farmhash.cc", "csv_loader.cc", "json_columns.cc"]
OUT = HERE / "librectpu_io.so"


def build(verbose: bool = True) -> Path:
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
        "-Wall", "-Wextra",
        *[str(HERE / s) for s in SOURCES],
        "-o", str(OUT),
    ]
    if verbose:
        print(" ".join(cmd), file=sys.stderr)
    subprocess.run(cmd, check=True)
    return OUT


if __name__ == "__main__":
    build()
    print(f"built: {OUT}")
