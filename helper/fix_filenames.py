#!/usr/bin/env python3
"""Normalise snapshot filenames to the zero-padded data_%06d layout.

Script port of the reference's helper/fix_filenames.py, extended to take the
directory as an argument (default: cwd) and to handle the .npz fallback
snapshots as well as .h5.
"""
import os
import re
import sys

pattern = re.compile(r"^(data_)0*(\d+)(\.h5|\.npz)$")


def fix(directory="."):
    for fname in os.listdir(directory):
        m = pattern.match(fname)
        if m:
            prefix, num_str, suffix = m.groups()
            newname = f"{prefix}{int(num_str):06d}{suffix}"
            if fname != newname:
                os.rename(os.path.join(directory, fname),
                          os.path.join(directory, newname))
                print(f"Renamed {fname} -> {newname}")


if __name__ == "__main__":
    fix(sys.argv[1] if len(sys.argv) > 1 else ".")
