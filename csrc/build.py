"""Build the fastio C extension in place (no pybind11 in this environment).

Usage: python csrc/build.py   (or let meshrcnn_tpu.data.serialization trigger it
lazily on first import). Produces csrc/fastio.<abi>.so.
"""
from __future__ import annotations

import os
import subprocess
import sysconfig


def build(verbose: bool = False) -> str:
    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "fastio.c")
    suffix = sysconfig.get_config_var("EXT_SUFFIX")
    out = os.path.join(here, "fastio" + suffix)
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    include = sysconfig.get_paths()["include"]
    cc = sysconfig.get_config_var("CC") or "gcc"
    cmd = cc.split() + ["-O3", "-shared", "-fPIC", f"-I{include}", src, "-o", out]
    subprocess.run(cmd, check=True,
                   capture_output=not verbose)
    return out


if __name__ == "__main__":
    print(build(verbose=True))
