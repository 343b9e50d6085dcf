"""Summarize a jax.profiler trace captured with --profile-dir: print the
top self-time ops from the XPlane protobuf as a table, without needing a
TensorBoard server.

The reference has no profiler at all (SURVEY §5: torch.cuda.synchronize
timing only); this closes the loop on the TPU-native tracing story:
capture with `train.py/test.py --profile-dir`, inspect with this tool or
any TensorBoard with the profile plugin (xprof).

Usage:
    python tools/profile_summary.py <trace_dir> [N]

<trace_dir> is the --profile-dir argument (the tool finds the
plugins/profile/<run>/ directory inside); N = number of ops (default 15).
"""
import glob
import json
import os
import sys


def find_xspace(trace_dir: str) -> str:
    cands = sorted(glob.glob(os.path.join(
        trace_dir, "plugins", "profile", "*", "*.xplane.pb")))
    if not cands:
        cands = sorted(glob.glob(os.path.join(trace_dir, "*.xplane.pb")))
    if not cands:
        raise SystemExit(f"no *.xplane.pb under {trace_dir}")
    return cands[-1]  # newest run


def main():
    if len(sys.argv) < 2:
        raise SystemExit(__doc__.strip())
    trace_dir = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    xspace = find_xspace(trace_dir)

    from xprof.convert import raw_to_tool_data

    def tool_rows(tool):
        data, _ = raw_to_tool_data.xspace_to_tool_data([xspace], tool, {})
        if data is None:  # converter failure (truncated/corrupt trace)
            return []
        if isinstance(data, bytes):
            data = data.decode("utf-8", "replace")
        tables = json.loads(data)
        if isinstance(tables, dict):
            tables = [tables]
        out = []
        for tab in tables:
            cols = [c.get("id", c.get("label", ""))
                    for c in tab.get("cols", [])]
            for raw in tab.get("rows", []):
                vals = [cell.get("v") if isinstance(cell, dict) else cell
                        for cell in raw.get("c", raw)]
                out.append(dict(zip(cols, vals)))
        return out

    def num(row, key):
        try:
            return float(row.get(key) or 0)
        except (TypeError, ValueError):
            return 0.0

    print(f"trace: {xspace}")

    # per-HLO device stats (populated for TPU traces): self time + what the
    # op is bound by + achieved FLOP rate / memory bandwidth
    rows = [r for r in tool_rows("hlo_stats")
            if str(r.get("hlo_op_name", "")) not in ("", "IDLE")]
    if rows:
        rows.sort(key=lambda r: num(r, "total_self_time"), reverse=True)
        total = sum(num(r, "total_self_time") for r in rows)
        print(f"device HLO self time: {total/1e3:.2f} ms "
              f"({len(rows)} op rows)")
        print(f"{'self ms':>9} {'%':>6} {'#':>7} {'bound by':>10}  "
              f"category / op")
        for r in rows[:top_n]:
            us = num(r, "total_self_time")
            print(f"{us/1e3:9.2f} {100*us/max(total,1e-9):6.1f} "
                  f"{int(num(r, 'occurrences')):>7} "
                  f"{str(r.get('bound_by') or '-'):>10}  "
                  f"{r.get('category', '?')} / "
                  f"{str(r.get('hlo_op_name', '?'))[:70]}")
        return

    # fallback (CPU-backend traces have no per-HLO device rows): framework
    # op totals, host+device
    rows = [r for r in tool_rows("framework_op_stats")
            if str(r.get("operation", "")) != "IDLE"]
    if not rows:
        raise SystemExit(
            "no per-op stats in this trace (CPU-backend traces only carry "
            "TraceMe events) — open the trace_viewer in TensorBoard's "
            "profile plugin instead")
    rows.sort(key=lambda r: num(r, "total_self_time"), reverse=True)
    total = sum(num(r, "total_self_time") for r in rows)
    print(f"total host+device self time: {total/1e3:.2f} ms "
          f"({len(rows)} op rows)")
    print(f"{'self ms':>9} {'%':>6} {'#':>7}  op")
    for r in rows[:top_n]:
        us = num(r, "total_self_time")
        print(f"{us/1e3:9.2f} {100*us/max(total,1e-9):6.1f} "
              f"{int(num(r, 'occurrences')):>7}  "
              f"{str(r.get('operation', '?'))[:90]}")


if __name__ == "__main__":
    main()
