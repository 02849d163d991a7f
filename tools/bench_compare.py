#!/usr/bin/env python3
"""Compare two graft.Bench JSON lines: per-query deltas + regressions.

Usage: python3 tools/bench_compare.py <old.json-or-log> <new.json-or-log>

Accepts either a raw BENCH_r*.json from the driver (whose payload may sit
inside a 'tail' field as the last logged line) or a plain log file
containing the single {"metric":...} line. Flags queries regressing
>1.5x and prints throughput/scaling movement.
"""
import sys, json, re


def load(path):
    txt = open(path).read()
    # driver BENCH_r*.json wraps the line; logs prefix it with [info]
    try:
        d = json.loads(txt)
        if "queries" in d:
            return d
        txt = d.get("tail", txt)
    except json.JSONDecodeError:
        pass
    matches = re.findall(r'\{"metric":.*\}', txt)
    if not matches:
        raise SystemExit(f"no bench JSON line found in {path}")
    return json.loads(matches[-1])


def main(old_path, new_path):
    old, new = load(old_path), load(new_path)
    oq, nq = old["queries"], new["queries"]
    print(f"throughput: {old['value']:,.0f} -> {new['value']:,.0f} turns/sec "
          f"({new['value'] / old['value']:.2f}x)")
    os_, ns_ = old.get("scaling", {}), new.get("scaling", {})
    if os_ and ns_:
        print(f"scaling efficiency: {os_['efficiency']} -> {ns_['efficiency']} "
              f"(steal old {os_.get('steal_pct_low_pass')}/{os_.get('steal_pct_high_pass')}%, "
              f"new {ns_.get('steal_pct_low_pass')}/{ns_.get('steal_pct_high_pass')}%)")
    print(f"total query sec: {old.get('total_query_sec')} -> {new.get('total_query_sec')}")
    rows = []
    for k in sorted(set(oq) | set(nq)):
        a, b = oq.get(k), nq.get(k)
        # -1 encodes "query failed" in the bench JSON — a failure is the
        # worst regression there is and must never read as 'no regression'
        failed = b is not None and b < 0
        ratio = (b / a) if (a and b and a > 0 and b > 0) else None
        rows.append((k, a, b, ratio, failed))
    print(f"\n{'query':32s} {'old_s':>7s} {'new_s':>7s} {'ratio':>6s}")
    for k, a, b, r, failed in rows:
        flag = (" <-- FAILED in new run" if failed
                else " <-- REGRESSION >1.5x" if (r and r > 1.5 and b > 0.5)
                else " (was failing)" if (a is not None and a < 0) else "")
        print(f"{k:32s} {a if a is not None else '-':>7} "
              f"{b if b is not None else '-':>7} "
              f"{f'{r:.2f}' if r else 'FAIL' if failed else 'new':>6s}{flag}")
    regs = [k for k, a, b, r, failed in rows
            if failed or (r and r > 1.5 and b > 0.5)]
    print(f"\nregressions >1.5x (and >0.5s) or failures: {regs if regs else 'none'}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
