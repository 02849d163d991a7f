#!/usr/bin/env python3
"""Round-end guard for the driver's correctness artifact.

CORRECTNESS_r03.json arrived as `{}` — the round shipped with no hard
driver-side correctness signal even though Verify + the DuckDB oracle were
green when re-run by hand. This guard makes that failure loud:

    python3 tools/correctness_guard.py CORRECTNESS_r04.json /tmp/v4

exits non-zero unless the artifact (1) exists, (2) is non-empty, (3) has a
row for every query named in <verify_out>/oracle_sql.json, and (4) every
row with an oracle passed rows+schema+hash. Run it against the newest
CORRECTNESS_r*.json whenever one appears; if it fails, re-derive the
signal with tools/local_oracle_check.py and flag the driver handshake.
"""
import sys, json, os

def main(artifact, verify_out):
    if not os.path.exists(artifact):
        print(f"GUARD FAIL: {artifact} does not exist"); return 1
    data = json.load(open(artifact))
    if not data:
        print(f"GUARD FAIL: {artifact} is empty ({{}}) — driver compare produced nothing"); return 1
    oracle = json.load(open(os.path.join(verify_out, "oracle_sql.json")))
    missing = sorted(set(oracle) - set(data))
    if missing:
        print(f"GUARD FAIL: {len(missing)} oracled queries absent from artifact: {missing[:10]}"); return 1
    bad = [k for k, v in sorted(data.items())
           if k in oracle and not (v.get("rows_match") and v.get("schema_match") and v.get("hash_match"))]
    if bad:
        print(f"GUARD FAIL: {len(bad)} oracled queries not fully green: {bad[:10]}"); return 1
    print(f"GUARD PASS: {len([k for k in data if k in oracle])} oracled queries green, "
          f"{len(data)} total rows in {artifact}")
    return 0

if __name__ == "__main__":
    if len(sys.argv) != 3:
        print(__doc__); sys.exit(2)
    sys.exit(main(sys.argv[1], sys.argv[2]))
