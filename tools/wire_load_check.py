#!/usr/bin/env python3
"""Load-proof for the wire-format SQL dump (graft.WireDump output).

Loads <dumpDir>/sql/<table>/{ddl.sql,rows/} into a REAL sqlite3 database,
replays every INSERT a second time (idempotency must hold via the
row_key PRIMARY KEY + OR IGNORE), and compares per-table counts against
<dumpDir>/manifest.json. Also sanity-parses the Cypher dump (every line
one MERGE/MATCH statement, balanced braces, count matches manifest).

Usage: python3 tools/wire_load_check.py /tmp/graft_wire
"""
import glob
import json
import os
import sqlite3
import sys


def read_rows(table_dir):
    stmts = []
    for part in sorted(glob.glob(os.path.join(table_dir, "rows", "part-*"))):
        with open(part, encoding="utf-8") as f:
            stmts.extend(line for line in (l.strip() for l in f) if line)
    return stmts


def main(dump_dir):
    with open(os.path.join(dump_dir, "manifest.json"), encoding="utf-8") as f:
        manifest = json.load(f)
    failures = 0

    con = sqlite3.connect(":memory:")
    sql_tables = {k: v for k, v in manifest.items() if not k.startswith("_")}
    for name, expected in sorted(sql_tables.items()):
        tdir = os.path.join(dump_dir, "sql", name)
        ddl = open(os.path.join(tdir, "ddl.sql"), encoding="utf-8").read()
        con.executescript(ddl)
        stmts = read_rows(tdir)
        for s in stmts:
            con.execute(s)
        # replay: OR IGNORE + PRIMARY KEY must make this a no-op
        for s in stmts:
            con.execute(s)
        got = con.execute(f"SELECT count(*) FROM {name}").fetchone()[0]
        has_pk = "PRIMARY KEY" in ddl
        replay_ok = got == expected if has_pk else got == 2 * expected
        if got == expected and has_pk:
            print(f"PASS {name} ({got} rows, replay idempotent)")
        elif replay_ok and not has_pk:
            print(f"WARN {name} ({expected} rows loaded, no PK -> replay duplicates)")
        else:
            print(f"FAIL {name}: expected {expected}, sqlite has {got} after replay "
                  f"(pk={has_pk})")
            failures += 1

    for kind, key in (("nodes", "_cypher_nodes"), ("edges", "_cypher_edges")):
        stmts = []
        for part in sorted(glob.glob(os.path.join(dump_dir, "cypher", kind, "part-*"))):
            with open(part, encoding="utf-8") as f:
                stmts.extend(line for line in (l.strip() for l in f) if line)
        bad = [s for s in stmts
               if not (s.endswith(";") and s.count("{") == s.count("}")
                       and (s.startswith("MERGE (") or s.startswith("MATCH (")))]
        if len(stmts) == manifest[key] and not bad:
            print(f"PASS cypher/{kind} ({len(stmts)} statements)")
        else:
            print(f"FAIL cypher/{kind}: {len(stmts)} statements vs manifest "
                  f"{manifest[key]}, {len(bad)} malformed"
                  + (f"; first bad: {bad[0][:120]}" if bad else ""))
            failures += 1

    print(f"\n{'FAIL' if failures else 'PASS'}: {failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_wire"))
