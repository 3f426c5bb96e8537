"""Input-pipeline throughput at DTU-shaped decode (VERDICT r4 item 8).

Measures io.pipeline.DataLoader samples/s on full-resolution JPEG decode
(1152x864, 5 views per sample, reference CasMVSNet eval shape) for several
thread counts, against the chip's measured consumption rate — the
starvation question the reference answers with 4-16 worker *processes*
(MVSNet/train.py:88-89).

    python benchmarks/bench_loader.py [--height 864] [--width 1152]

Writes its findings to stdout; record them in benchmarks/PERF_NOTES.md.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="/tmp/loader_bench_dtu")
    p.add_argument("--height", type=int, default=864)
    p.add_argument("--width", type=int, default=1152)
    p.add_argument("--views", type=int, default=5)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--batches", type=int, default=12)
    p.add_argument("--threads", type=int, nargs="*", default=[1, 4, 8, 16])
    args = p.parse_args(argv)

    from mvs_tpu.io import dtu as dtu_io
    from mvs_tpu.io.pipeline import DataLoader
    from mvs_tpu.utils.make_synthetic_dtu import generate

    root = Path(args.root)
    marker = root / f".gen_{args.height}x{args.width}"
    if not marker.exists():
        print(f"generating {args.height}x{args.width} fixture under {root} "
              "(one-time)...", flush=True)
        generate(root, num_scans=2, num_views=args.views, height=args.height,
                 width=args.width, num_depth=16, tilt=(0.05, 0.03))
        marker.touch()

    ds = dtu_io.DTUTrainDataset(
        str(root), ["scan1", "scan2"], num_views=min(3, args.views),
        num_depth=16, interval_scale=1.0,
    )
    print(f"dataset: {len(ds)} samples, {min(3, args.views)} views @ "
          f"{args.height}x{args.width}")

    for nt in args.threads:
        loader = DataLoader(ds, args.batch, dtu_io.collate_cascade,
                            num_threads=nt, seed=0)
        it = iter(loader)
        next(it)  # warm the prefetch pipeline
        t0 = time.perf_counter()
        n = 0
        for _ in range(args.batches):
            try:
                next(it)
                n += args.batch
            except StopIteration:
                it = iter(loader)
        dt = time.perf_counter() - t0
        print(f"threads={nt:>2}: {n / dt:6.2f} samples/s "
              f"({dt / max(n, 1) * 1e3:.0f} ms/sample)")

    print("chip consumption for comparison: serving 5.79 maps/s "
          "(BENCH_r04) needs ~5.8 eval samples/s; a b=2 train step at "
          "these shapes runs ~1 step/s -> ~2 samples/s.")


if __name__ == "__main__":
    main()
