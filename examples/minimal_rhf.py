"""Minimal RHF run (parity with example_scripts/minimal-rhf.py)."""
import sys

import juliachem_jl_tpu as jc


def minimal_rhf(input_file):
    jc.initialize()
    out = jc.run_file(input_file, output=2)
    jc.finalize()
    return out


if __name__ == "__main__":
    minimal_rhf(sys.argv[1])
