"""Checkpoint inspection/surgery tools (reference utils/ckpt_kits.py:21-90):
variable listing, name rewriting, checkpoint discovery — for orbax trees.

    python -m boxsegliver_tpu.utils.ckpt_tools list   <ckpt path>
    python -m boxsegliver_tpu.utils.ckpt_tools rename <in> <out> --replace a:b
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Iterable, Optional, Tuple

import numpy as np


def flatten_tree(tree, prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_tree(v, f"{prefix}/{k}" if prefix else str(k)))
    else:
        out[prefix] = np.asarray(tree)
    return out


def unflatten_tree(flat: Dict[str, np.ndarray]) -> Dict:
    root: Dict = {}
    for name, value in flat.items():
        parts = name.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return root


def load_ckpt_tree(path) -> Dict:
    import orbax.checkpoint as ocp
    return ocp.StandardCheckpointer().restore(Path(path).resolve())


def list_vars(path) -> Dict[str, Tuple]:
    """name → (shape, dtype) map (reference list_vars_shape/dtype)."""
    flat = flatten_tree(load_ckpt_tree(path))
    return {k: (tuple(v.shape), str(v.dtype)) for k, v in flat.items()}


def ckpt_vars_rename(input_path, output_path=None,
                     replace_from: Iterable[str] = (),
                     replace_to: Iterable[str] = (),
                     add_prefix: Optional[str] = None) -> Dict:
    """Rewrite parameter path names (reference ckpt_vars_rename,
    ckpt_kits.py:36-60: 'empty' in replace_to means delete the substring)."""
    replace_from = list(replace_from)
    replace_to = ["" if x == "empty" else x for x in replace_to]
    assert len(replace_from) == len(replace_to)
    flat = flatten_tree(load_ckpt_tree(input_path))
    renamed = {}
    for k in sorted(flat):
        new = k
        for f, t in zip(replace_from, replace_to):
            new = new.replace(f, t)
        if add_prefix:
            new = add_prefix + new
        renamed[new] = flat[k]
    tree = unflatten_tree(renamed)
    if output_path:
        import orbax.checkpoint as ocp
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(Path(output_path).resolve(), tree, force=True)
        ckptr.wait_until_finished()
    return tree


def find_checkpoint(model_dir, status_file: str = "checkpoint") -> Optional[Path]:
    """Locate the newest checkpoint under a model dir (reference
    find_checkpoint, ckpt_kits.py:62-90): 'checkpoint' → latest periodic;
    'checkpoint_best[_N]' → the matching best-line directory."""
    model_dir = Path(model_dir)
    if status_file.startswith("checkpoint_best"):
        tag = status_file.replace("checkpoint_", "")
        path = model_dir / "ckpt_best" / tag
        return path if path.exists() else None
    ckpt_root = model_dir / "ckpt"
    if not ckpt_root.exists():
        return None
    steps = sorted((int(p.name) for p in ckpt_root.iterdir()
                    if p.name.isdigit()), reverse=True)
    return ckpt_root / str(steps[0]) if steps else None


def main(argv=None):
    import argparse
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)
    p = sub.add_parser("list")
    p.add_argument("path")
    p = sub.add_parser("rename")
    p.add_argument("input")
    p.add_argument("output")
    p.add_argument("--replace", nargs="*", default=[],
                   help="from:to pairs ('empty' deletes the substring)")
    p.add_argument("--add_prefix")
    args = parser.parse_args(argv)
    if args.cmd == "list":
        for k, (shape, dtype) in sorted(list_vars(args.path).items()):
            print(k, shape, dtype)
    else:
        pairs = [r.split(":", 1) for r in args.replace]
        ckpt_vars_rename(args.input, args.output,
                         [p[0] for p in pairs], [p[1] for p in pairs],
                         args.add_prefix)


if __name__ == "__main__":
    main()
