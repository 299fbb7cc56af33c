"""Summarize a jax.profiler trace (xplane.pb) into an op-time breakdown.

The profiling companion the reference lacks entirely (SURVEY.md §5: its
only tracing is torch.autograd record_function wrappers). Reads the
TensorBoard-format trace written by `python bench.py --profile` and prints
the top self-time ops and a category rollup (conv / fusion / pallas /
copy / all-reduce ...), so BENCH movements can be attributed to kernels.

Usage: python tools/trace_summary.py [bench_trace] [--top 25]
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys
from collections import defaultdict


def find_xplane(logdir: str) -> str:
    pats = [
        os.path.join(logdir, "plugins", "profile", "*", "*.xplane.pb"),
        os.path.join(logdir, "**", "*.xplane.pb"),
    ]
    for p in pats:
        hits = sorted(glob.glob(p, recursive=True))
        if hits:
            return hits[-1]
    raise SystemExit(f"no .xplane.pb under {logdir}")


def load_op_stats(xplane_path: str):
    """Returns list of dicts with op name/category/self time using the
    tensorboard profile plugin's converters (xprof)."""
    try:
        from xprof.convert import raw_to_tool_data
    except ImportError:
        from tensorboard_plugin_profile.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [xplane_path], "framework_op_stats", {}
    )
    if isinstance(data, bytes):
        data = data.decode()
    parsed = json.loads(data)
    # gviz DataTable list: [{"cols":[{"id":...},...], "rows":[{"c":[{"v":..}]}]}]
    tables = parsed if isinstance(parsed, list) else [parsed]
    out = []
    for tbl in tables:
        if not isinstance(tbl, dict) or "cols" not in tbl:
            continue
        ids = [c.get("id", c.get("label", str(i))) for i, c in enumerate(tbl["cols"])]
        for row in tbl.get("rows", []):
            cells = row.get("c", [])
            out.append({
                ids[i]: (cells[i] or {}).get("v") if i < len(cells) else None
                for i in range(len(ids))
            })
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("logdir", nargs="?", default="bench_trace")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    xp = find_xplane(args.logdir)
    print(f"trace: {xp}", file=sys.stderr)
    rows = load_op_stats(xp)
    if not rows:
        raise SystemExit("no op stats in trace")

    def f(row, *names, default=0.0):
        for n in names:
            if n in row and row[n] not in ("", None):
                try:
                    return float(row[n])
                except (TypeError, ValueError):
                    pass
        return default

    def s(row, *names):
        for n in names:
            if n in row and row[n]:
                return str(row[n])
        return "?"

    ops = []
    for r in rows:
        if s(r, "host_or_device").lower() == "host":
            continue
        ops.append(dict(
            name=s(r, "operation", "op_name", "Operation", "name"),
            category=s(r, "type", "category", "Type", "Category"),
            self_us=f(r, "total_self_time", "total_self_time_us", "self_time_us"),
            occurrences=f(r, "occurrences", "#Occurrences"),
            flop_rate=f(r, "measured_flop_rate", "GFLOPs/sec"),
        ))
    ops = [o for o in ops if o["self_us"] > 0]
    # the gviz payload repeats rows across tables — dedup exact duplicates
    seen, uniq = set(), []
    for o in ops:
        k = (o["name"], o["self_us"], o["occurrences"])
        if k not in seen:
            seen.add(k)
            uniq.append(o)
    ops = uniq
    ops.sort(key=lambda o: -o["self_us"])
    total = sum(o["self_us"] for o in ops)

    cats = defaultdict(float)
    for o in ops:
        cats[o["category"]] += o["self_us"]

    print(f"\n== category rollup (total {total/1e3:.1f} ms device self-time) ==")
    for c, us in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"{us/total*100:6.1f}%  {us/1e3:9.2f} ms  {c}")

    print(f"\n== top {args.top} ops by self time ==")
    for o in ops[: args.top]:
        print(f"{o['self_us']/total*100:6.1f}%  {o['self_us']/1e3:9.2f} ms  "
              f"x{int(o['occurrences']):4d}  [{o['category']}] {o['name'][:90]}")

    if args.json:
        with open(args.json, "w") as fh:
            json.dump(dict(total_us=total, categories=dict(cats), ops=ops[:100]), fh,
                      indent=2)
        print(f"wrote {args.json}", file=sys.stderr)


if __name__ == "__main__":
    main()
