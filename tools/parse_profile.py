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


class HloIndex:
    """Resolve hlo_stats op names (fusion.394, ...) to source provenance from
    an optimized-HLO text dump (tools/profile_step.py --outdir writes
    compiled_hlo.txt next to the xplane).

    For a fusion, provenance = the largest few instructions of its fused
    computation (by output element count) with their metadata op_name /
    source_file:line — enough to tell a norm-apply from a loss term from an
    optimizer update without guessing from the category."""

    _META = re.compile(r'metadata=\{([^}]*)\}')
    _SHAPE = re.compile(r'= ([a-z0-9]+)\[([\d,]*)\]')

    def __init__(self, hlo_text: str):
        self.computations = {}  # name -> list of instruction lines
        cur = None
        for line in hlo_text.splitlines():
            m = re.match(r'(?:ENTRY\s+)?%?([\w\.\-]+)\s*(\([^)]*\).*)?\{\s*$',
                         line.strip())
            if m and ("(" in line and ")" in line):
                cur = m.group(1)
                self.computations[cur] = []
            elif line.strip() == "}":
                cur = None
            elif cur is not None and "=" in line:
                self.computations[cur].append(line.strip())
        # instruction name -> (line, computation) for top-level lookup
        self.instr = {}
        for comp, lines in self.computations.items():
            for l in lines:
                m = re.match(r'(?:ROOT\s+)?%?([\w\.\-]+)\s*=', l)
                if m:
                    self.instr.setdefault(m.group(1), (l, comp))

    def _meta_str(self, line: str) -> str:
        m = self._META.search(line)
        if not m:
            return ""
        kv = dict(re.findall(r'(\w+)="?([^",]*)"?', m.group(1)))
        op = kv.get("op_name", "")
        src = kv.get("source_file", "")
        ln = kv.get("source_line", "")
        if src:
            src = src.rsplit("/", 1)[-1]
        return f"{op} @{src}:{ln}" if src else op

    def provenance(self, op_name: str, k: int = 3) -> str:
        hit = self.instr.get(op_name)
        if not hit:
            return ""
        line, _ = hit
        m = re.search(r'calls=%?([\w\.\-]+)', line)
        if not m:  # non-fusion op: its own metadata
            return self._meta_str(line)
        body = self.computations.get(m.group(1), [])
        sized = []
        for l in body:
            if "parameter(" in l or "constant(" in l:
                continue
            sm = self._SHAPE.search(l)
            n = 1
            if sm and sm.group(2):
                for d in sm.group(2).split(","):
                    n *= int(d)
            meta = self._meta_str(l)
            if meta:
                sized.append((n, meta))
        sized.sort(key=lambda t: -t[0])
        seen, out = set(), []
        for _, meta in sized:
            if meta not in seen:
                seen.add(meta)
                out.append(meta)
            if len(out) >= k:
                break
        return " | ".join(out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("profile_dir")
    ap.add_argument("--steps", type=int, default=8,
                    help="steps captured inside the trace window")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--hlo", default=None,
                    help="optimized-HLO text dump for op provenance "
                         "(default: <profile_dir>/compiled_hlo.txt if present)")
    opts = ap.parse_args()
    rows = load_hlo_stats(opts.profile_dir)
    n = opts.steps

    hlo_path = Path(opts.hlo) if opts.hlo else \
        Path(opts.profile_dir) / "compiled_hlo.txt"
    index = HloIndex(hlo_path.read_text()) if hlo_path.exists() else None

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
        if index is not None:
            prov = index.provenance(r["hlo_op_name"])
            if prov:
                print(f"{'':40s} ↳ {prov}")

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
