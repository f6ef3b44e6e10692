"""Parse a jax.profiler xplane (tools/profile_step.py output) into per-op
time/bandwidth tables — the measured-truth counterpart of XLA cost analysis.

Produces: top-N ops by self time (with roofline attribution from xprof),
category and spatial-resolution aggregations, and total measured HBM traffic.

Usage: python tools/parse_profile.py /tmp/boxseg_profile [--steps 8] [--top 25]
"""

from __future__ import annotations

import argparse
import json
import re
from collections import defaultdict
from pathlib import Path


def load_hlo_stats(profile_dir: str):
    """hlo_stats rows from the newest xplane under profile_dir."""
    from xprof.convert import raw_to_tool_data as r
    planes = sorted(Path(profile_dir).rglob("*.xplane.pb"))
    if not planes:
        raise SystemExit(f"no xplane.pb under {profile_dir}")
    data, _ = r.xspace_to_tool_data([str(planes[-1])], "hlo_stats", {})
    d = json.loads(data)
    cols = [c["id"] for c in d["cols"]]
    return [dict(zip(cols, [c["v"] if isinstance(c, dict) else c
                            for c in row["c"]])) for row in d["rows"]]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("profile_dir")
    ap.add_argument("--steps", type=int, default=8,
                    help="steps captured inside the trace window")
    ap.add_argument("--top", type=int, default=25)
    opts = ap.parse_args()
    rows = load_hlo_stats(opts.profile_dir)
    n = opts.steps

    total = sum(float(r["total_self_time"] or 0) for r in rows)
    total_gb = sum(float(r["hbm_bw"] or 0) * float(r["total_self_time"] or 0)
                   * 1e-6 for r in rows)
    print(f"device self time: {total / n / 1e3:.2f} ms/step; measured HBM "
          f"traffic: {total_gb / n:.2f} GB/step")

    print(f"\n== top {opts.top} ops by self time ==")
    print(f"{'op':40s} {'category':20s} {'ms/step':>8s} {'%':>5s} "
          f"{'TFLOP/s':>8s} {'GB/s':>6s} {'int':>5s}  bound")
    for r in sorted(rows, key=lambda r: -float(r["total_self_time"] or 0))[
            :opts.top]:
        st = float(r["total_self_time"] or 0)
        print(f"{r['hlo_op_name'][:40]:40s} {r['category'][:20]:20s} "
              f"{st / n / 1e3:8.3f} {100 * st / total:5.1f} "
              f"{float(r['model_flop_rate'] or 0) / 1e3:8.1f} "
              f"{float(r['hbm_bw'] or 0):6.0f} "
              f"{float(r['operational_intensity'] or 0):5.0f}  {r['bound_by']}")

    for title, key in (
            ("category", lambda r: r["category"]),
            ("spatial resolution (NHWC batch-32 shapes)",
             lambda r: (re.search(r"32,(\d+),\1", r["hlo_op_expression"] or "")
                        or [None, "weights/misc"])[1]),
            ("roofline bound", lambda r: r["bound_by"] or "?")):
        agg = defaultdict(lambda: [0.0, 0.0])
        for r in rows:
            st = float(r["total_self_time"] or 0)
            b = agg[key(r)]
            b[0] += st
            b[1] += float(r["hbm_bw"] or 0) * st * 1e-6
        print(f"\n== by {title} ==")
        for k, (st, gb) in sorted(agg.items(), key=lambda x: -x[1][0]):
            print(f"{str(k):30s} {st / n / 1e3:8.2f} ms/step "
                  f"{100 * st / total:5.1f}%  {gb / n:7.2f} GB/step")


if __name__ == "__main__":
    main()
