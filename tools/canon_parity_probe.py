#!/usr/bin/env python3
"""Check graft_canon_double parity with Python repr() / DuckDB VARCHAR casts.

Usage:
  sbt -batch "Test/runMain graft.CanonProbe 1000000 /tmp/canon_probe.tsv"
  python3 tools/canon_parity_probe.py /tmp/canon_probe.tsv

Python's repr(float) and DuckDB's CAST(double AS VARCHAR) both emit the
shortest round-tripping decimal with nearest-tie-even digit selection; the
engine's canonDouble must match byte-for-byte because it feeds cross-system
content-signature hashing (GraphOps / q41).
"""
import sys, struct


def main(path):
    bad = n = 0
    for line in open(path):
        bits, canon = line.rstrip("\n").split("\t")
        d = struct.unpack("<d", struct.pack("<q", int(bits)))[0]
        if repr(d) != canon:
            bad += 1
            if bad <= 10:
                print(f"MISMATCH {repr(d)} canon={canon}")
        n += 1
    print(f"{n} checked, {bad} mismatches")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))
