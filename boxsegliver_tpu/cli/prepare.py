"""Offline preprocessing CLI (reference DataLoader/*/extract.py interactive
menu → explicit subcommands):

    python -m boxsegliver_tpu.cli.prepare extract  --src <nifti dir> --dst <cache dir>
    python -m boxsegliver_tpu.cli.prepare hist     --dst <cache dir>
    python -m boxsegliver_tpu.cli.prepare prior    --dst <cache dir>
    python -m boxsegliver_tpu.cli.prepare kfold    --dst <cache dir> --k 5
    python -m boxsegliver_tpu.cli.prepare synthetic --dst <cache dir> [--cases N]
"""

from __future__ import annotations

import argparse
from pathlib import Path


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("extract", help="NIfTI → npy cache + meta.json")
    p.add_argument("--src", required=True)
    p.add_argument("--dst", required=True)
    p.add_argument("--only_meta", action="store_true")
    p.add_argument("--modality", choices=["liver", "nf"], default="liver",
                   help="Value window + lesion label preset")
    p.add_argument("--no_lits_quirk", action="store_true",
                   help="Disable the LiTS case-28..51 orientation fix")

    p = sub.add_parser("hist", help="Histogram context features")
    p.add_argument("--dst", required=True)
    p.add_argument("--bins", type=int, default=100)

    p = sub.add_parser("prior", help="Simulated user prior (prior.json)")
    p.add_argument("--dst", required=True)

    p = sub.add_parser("kfold", help="Create k-fold split file")
    p.add_argument("--dst", required=True)
    p.add_argument("--k", type=int, default=5)
    p.add_argument("--seed", type=int, default=1357)

    p = sub.add_parser("synthetic", help="Generate hermetic synthetic dataset")
    p.add_argument("--dst", required=True)
    p.add_argument("--cases", type=int, default=4)
    p.add_argument("--depth", type=int, default=24)
    p.add_argument("--size", type=int, default=256)

    args = parser.parse_args(argv)

    if args.cmd == "extract":
        from boxsegliver_tpu.data.meta import extract_dataset
        metas = extract_dataset(args.src, args.dst, only_meta=args.only_meta,
                                lits_quirk=not args.no_lits_quirk,
                                modality=args.modality)
        print(f"Extracted {len(metas)} cases → {args.dst}/meta.json")
    elif args.cmd == "hist":
        from boxsegliver_tpu.data.meta import dump_hist_features
        out = dump_hist_features(args.dst, bins=args.bins)
        print(f"Histogram features → {out}")
    elif args.cmd == "prior":
        from boxsegliver_tpu.data.meta import load_meta, simulate_user_prior
        metas = load_meta(args.dst)
        simulate_user_prior(metas, Path(args.dst) / "prior.json")
        print(f"Prior → {args.dst}/prior.json")
    elif args.cmd == "kfold":
        from boxsegliver_tpu.data.kfold import read_or_create_k_folds
        from boxsegliver_tpu.data.meta import load_meta
        metas = load_meta(args.dst)
        folds = read_or_create_k_folds(Path(args.dst) / "k_folds.txt",
                                       [m["PID"] for m in metas],
                                       k_split=args.k, seed=args.seed)
        for i, f in enumerate(folds):
            print(f"Fold {i}: {' '.join(f)}")
    elif args.cmd == "synthetic":
        from boxsegliver_tpu.data.synthetic import make_synthetic_dataset
        root = make_synthetic_dataset(args.dst, n_cases=args.cases,
                                      shape=(args.depth, args.size, args.size))
        print(f"Synthetic dataset → {root}")


if __name__ == "__main__":
    main()
