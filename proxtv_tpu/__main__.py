"""Command-line skin for proxtv_tpu (the second API surface; the reference's
second skin is its MATLAB MEX layer, matlab/*.cpp — a CLI is the TPU-host
equivalent).

Usage:
    python -m proxtv_tpu demo <signal|image|color|batched|weighted>
    python -m proxtv_tpu bench
    python -m proxtv_tpu denoise1d <in.npy> <out.npy> --lam 1.0 [--method m]
    python -m proxtv_tpu denoise2d <in.npy> <out.npy> --lam 0.3 [--method m]
"""
import argparse
import sys

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(prog="proxtv_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("demo", help="run a demo scenario")
    d.add_argument("which", choices=["signal", "image", "color", "batched",
                                     "weighted"])

    sub.add_parser("bench", help="run the benchmark harness")

    for name in ("denoise1d", "denoise2d"):
        s = sub.add_parser(name)
        s.add_argument("infile")
        s.add_argument("outfile")
        s.add_argument("--lam", type=float, required=True)
        s.add_argument("--method", default=None)

    t = sub.add_parser("tv", help="polymorphic TV front end (reference "
                                  "matlab/TV.m): --lam may be a scalar, a "
                                  "weight-vector .npy, or two weight-matrix "
                                  ".npy files (weighted 2D)")
    t.add_argument("infile")
    t.add_argument("outfile")
    t.add_argument("--lam", nargs="+", required=True,
                   help="scalar | weights.npy | wcol.npy wrow.npy")
    t.add_argument("--p", type=float, default=1.0)
    t.add_argument("--max-iters", type=int, default=0)

    args = p.parse_args(argv)

    if args.cmd == "demo":
        mod = {
            "signal": "demo_filter_signal",
            "image": "demo_filter_image",
            "color": "demo_filter_image_color",
            "batched": "demo_filter_image_batched",
            "weighted": "demo_filter_image_weighted",
        }[args.which]
        import importlib

        importlib.import_module(f"proxtv_tpu.demos.{mod}").main()
        return 0

    if args.cmd == "bench":
        import runpy
        import os

        runpy.run_path(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py"), run_name="__main__")
        return 0

    import proxtv_tpu as ptv

    x = np.load(args.infile)
    if args.cmd == "tv":
        if len(args.lam) == 2:  # two weight matrices -> weighted 2D
            lam = [np.load(args.lam[0]), np.load(args.lam[1])]
        elif args.lam[0].endswith(".npy"):  # weight vector -> weighted 1D
            lam = np.load(args.lam[0])
        else:
            lam = float(args.lam[0])
        out = ptv.tv(x, lam, p=args.p, max_iters=args.max_iters)
        np.save(args.outfile, np.asarray(out))
        print(f"wrote {args.outfile}")
        return 0
    if args.cmd == "denoise1d":
        kw = {"method": args.method} if args.method else {}
        out = ptv.tv1_1d(x, args.lam, **kw)
    else:
        kw = {"method": args.method} if args.method else {}
        out = ptv.tv1_2d(x, args.lam, **kw)
    np.save(args.outfile, np.asarray(out))
    print(f"wrote {args.outfile}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
