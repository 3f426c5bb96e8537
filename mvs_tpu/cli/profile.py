"""Profiling mode: warmup + traced steps -> perfetto/xplane trace.

    python -m mvs_tpu.cli profile [--config cfg.yaml] [--steps 5] [--warmup 3]

The TPU replacement for the reference's `--mode profile` chrome-trace dump
(MVSNet/train.py:279-307): runs the flagship forward (or a full train step
with --train) under jax.profiler.trace; view the trace with XProf/TensorBoard
or ui.perfetto.dev."""

from __future__ import annotations

import argparse
import time

import jax

__all__ = ["main"]


def main(argv=None):
    p = argparse.ArgumentParser(prog="mvs_tpu profile")
    p.add_argument("--logdir", default="runs/profile")
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--train", action="store_true",
                   help="profile a train step instead of forward")
    args = p.parse_args(argv)

    import sys

    sys.path.insert(0, ".")
    import __graft_entry__ as ge

    if args.train:
        # One-step train dryrun on all local devices, traced.
        n = len(jax.devices())
        with jax.profiler.trace(args.logdir):
            ge.dryrun_multichip(n)
        print(f"train-step trace written to {args.logdir}")
        return

    fn, fargs = ge.entry()
    jfn = jax.jit(fn)
    for _ in range(args.warmup):
        out = jfn(*fargs)
    jax.block_until_ready(out)

    t0 = time.time()
    with jax.profiler.trace(args.logdir):
        for _ in range(args.steps):
            out = jfn(*fargs)
        jax.block_until_ready(out)
    dt = (time.time() - t0) / args.steps
    print(f"{args.steps} steps traced to {args.logdir}; "
          f"{dt * 1e3:.2f} ms/step ({1.0 / dt:.2f} depth-maps/s)")


if __name__ == "__main__":
    main()
