"""Generate run_scripts/README.md: map every reference experiment script to
its repo equivalent (ported script, or "variant of X via flags Y").

Parses the train block of each reference launcher (scripts/10*.sh,
threed_script/20*.sh, run_scripts/template/*.sh), extracts the flag set,
diffs it against the ported family-base script, and checks every flag
against the repo CLI parser so unexpressible flag combinations are surfaced
instead of silently dropped.

Usage: python tools/gen_script_map.py [--write]
"""

from __future__ import annotations

import argparse
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REF = Path("/root/reference")
REPO = Path(__file__).resolve().parent.parent

# reference script family -> (ported repo script that is its base config,
#                              the REFERENCE script that repo script ports)
# Deltas are diffed against the reference base so they show exactly what the
# variant changes; the repo base accepts those overrides via `$@`.
FAMILY_BASE = [
    ("scripts/101_unetinter", "run_scripts/nf/101_unetinter_v10.sh",
     "scripts/101_unetinter_v10.sh"),
    ("scripts/106_unetinter", "run_scripts/nf/101_unetinter_v10.sh",
     "scripts/101_unetinter_v10.sh"),
    ("scripts/101_unet", "run_scripts/nf/101_unet_v2.sh",
     "scripts/101_unet_v2.sh"),
    ("scripts/102_gnet", "run_scripts/nf/102_gnet_v3.sh",
     "scripts/102_gnet_v3.sh"),
    ("scripts/103_grad", "run_scripts/nf/103_grad.sh", "scripts/103_grad.sh"),
    ("scripts/103_lgnet", "run_scripts/nf/103_lgnet_v3.sh",
     "scripts/103_lgnet_v3.sh"),
    ("scripts/104_small", "run_scripts/nf/104_small_v3.sh",
     "scripts/104_small_v3.sh"),
    ("scripts/105_interunet", "run_scripts/nf/105_interunet_v1.sh",
     "scripts/105_interunet_v1.sh"),
    ("threed_script/201_unet", "run_scripts/threed/201_unet_v1.sh",
     "threed_script/201_unet_v1.sh"),
    ("threed_script/202_unetinter", "run_scripts/threed/201_unet_v1.sh",
     "threed_script/201_unet_v1.sh"),
    ("run_scripts/template/001_unet", "run_scripts/template/001_unet.sh", None),
    ("run_scripts/template/001_dist", "run_scripts/template/001_dist.sh", None),
    ("run_scripts/template/002_gnet_sp", "run_scripts/template/002_gnet_sp.sh",
     None),
    ("run_scripts/template/002_gnet", "run_scripts/template/002_gnet.sh", None),
    ("run_scripts/eval_all_ckpt", "run_scripts/eval_all_ckpt.sh", None),
]


def parse_train_block(text: str):
    """(entry, task, {flag: value-string}) from a reference launcher's train
    section (the eval section repeats the model config at eval resolution)."""
    m = re.search(r'"\$TASK" == "train" \]\];? then(.*?)^\s*(?:elif|fi)\b',
                  text, re.S | re.M)
    block = m.group(1) if m else text
    em = re.search(r"(?:entry/|\./entry/)(\w+\.py)(?:\s+(\w+))?", block)
    entry, task = (em.group(1), em.group(2) or "") if em else ("?", "")
    tokens = re.sub(r"\\\n", " ", block).split()
    flags = {}
    i = 0
    while i < len(tokens):
        t = tokens[i]
        if t.startswith("--") or re.fullmatch(r"-[a-z]{2,}", t):
            vals = []
            j = i + 1
            while j < len(tokens) and not tokens[j].startswith("-") \
                    and tokens[j] not in ("$@",):
                vals.append(tokens[j])
                j += 1
            flags[t] = " ".join(vals)
            i = j
        else:
            i += 1
    flags.pop("--tag", None)  # always the script name
    return entry, task, flags


def repo_option_strings():
    from boxsegliver_tpu import config as config_mod
    parser = config_mod.build_parser()
    opts = set()
    for action in parser._actions:
        opts.update(action.option_strings)
    return opts


def find_base(rel: str):
    for prefix, base, ref_base in FAMILY_BASE:
        if rel.startswith(prefix):
            return base, ref_base
    return None, None


# reference flags that are deliberately not part of the repo CLI, with the
# reason shown in the table (GPU/TF1-runtime knobs replaced by the TPU design)
DROPPED = {
    "--distribution_strategy": "replaced by --num_replicas mesh DP",
    "--num_gpus": "replaced by --num_replicas mesh DP",
    "--all_reduce_alg": "XLA picks ICI collectives",
    "--device_mem_frac": "TF1 GPU knob; XLA manages HBM",
    "--evaluator": "evaluator dispatch is task-driven",
    "--summary_prefix": "summaries are tag-prefixed automatically",
    "--eval_num_batches_per_epoch": "online eval covers the split",
    "--warm_start_from": "same role: --load_weights",
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--write", action="store_true")
    opts = ap.parse_args()

    supported = repo_option_strings()
    base_flags = {}
    for _, _, ref_base in FAMILY_BASE:
        if ref_base and (REF / ref_base).exists():
            base_flags[ref_base] = parse_train_block(
                (REF / ref_base).read_text())

    scripts = sorted(
        list((REF / "scripts").glob("*.sh"))
        + list((REF / "threed_script").glob("*.sh"))
        + list((REF / "run_scripts").rglob("*.sh")))

    rows = []
    unsupported_total = {}
    for s in scripts:
        rel = str(s.relative_to(REF))
        entry, task, flags = parse_train_block(s.read_text())
        base, ref_base = find_base(rel.replace(".sh", ""))
        ported_here = base is not None and Path(base).name == s.name and (
            REPO / base).exists()
        if ported_here:
            rows.append((rel, f"{entry} {task}".strip(), "ported",
                         "— (ported 1:1, see the repo script)", "—"))
            continue
        if ref_base and ref_base in base_flags:
            _, _, bflags = base_flags[ref_base]
            delta = []
            for k, v in sorted(flags.items()):
                if k in DROPPED:
                    continue
                if bflags.get(k) != v:
                    delta.append(f"`{k} {v}`".replace(" `", "`") if v
                                 else f"`{k}`")
            for k in sorted(bflags):
                if k not in flags and k not in DROPPED \
                        and not k.startswith("--num_replicas"):
                    delta.append(f"drop `{k}`")
            delta_s = ", ".join(delta) if delta else "—"
        else:
            delta_s = "(no family base)"
        unsup = sorted(k for k in flags
                       if k not in supported and k not in DROPPED)
        for k in unsup:
            unsupported_total.setdefault(k, []).append(rel)
        status = ("ported" if ported_here else
                  f"variant of `{base}`" if base else "UNMAPPED")
        rows.append((rel, f"{entry} {task}".strip(), status, delta_s,
                     ", ".join(f"`{u}`" for u in unsup) or "—"))

    lines = [
        "# Reference experiment-script map",
        "",
        "Every launcher in the reference tree (`scripts/` 47, `threed_script/`"
        " 17, `run_scripts/` 5), accounted for: either ported under"
        " `run_scripts/`, or expressible as the named base script plus the"
        " listed flag overrides (the repo launchers all accept extra flags"
        " via `$@`, exactly like the reference).  Flags in the *dropped*"
        " table are TF1/GPU-runtime knobs with a TPU-design replacement.",
        "",
        "Generated by `tools/gen_script_map.py` (parses the train block of"
        " each reference script and diffs it against the family base;"
        " re-run with `--write` after porting more scripts).",
        "",
        "Repo-only additions (no reference launcher exists):"
        " `template/003_denseunet.sh` (DenseUNet + ImageNet h5 warm start)"
        " and `template/004_gnet_iin.sh` (the nf2/iin click-instance task —"
        " the reference wires `nf2` in entry/main_g.py:66 but ships no"
        " script for it).",
        "",
        "| Reference script | entry / task | Repo status | Flag deltas vs base |"
        " Flags w/o repo equivalent |",
        "|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append("| " + " | ".join(r) + " |")
    lines += [
        "",
        "## Dropped runtime flags (by design)",
        "",
        "| Reference flag | Replacement |",
        "|---|---|",
    ]
    for k, v in sorted(DROPPED.items()):
        lines.append(f"| `{k}` | {v} |")
    out = "\n".join(lines) + "\n"

    if unsupported_total:
        print("UNSUPPORTED FLAGS (port these or document):", file=sys.stderr)
        for k, v in sorted(unsupported_total.items()):
            print(f"  {k}: {len(v)} scripts, e.g. {v[0]}", file=sys.stderr)

    if opts.write:
        (REPO / "run_scripts" / "README.md").write_text(out)
        print("wrote run_scripts/README.md", file=sys.stderr)
    else:
        print(out)


if __name__ == "__main__":
    main()
