"""CLI dispatcher: python -m mvs_tpu.cli <train|infer|fuse|evaluate|profile> ..."""

from __future__ import annotations

import sys

_COMMANDS = ("train", "infer", "fuse", "evaluate", "profile")


def main():
    if len(sys.argv) < 2 or sys.argv[1] in ("-h", "--help"):
        print(f"usage: python -m mvs_tpu.cli {{{'|'.join(_COMMANDS)}}} [args...]")
        raise SystemExit(0 if len(sys.argv) >= 2 else 1)
    cmd, argv = sys.argv[1], sys.argv[2:]
    if cmd not in _COMMANDS:
        raise SystemExit(f"unknown command {cmd!r}; options: {_COMMANDS}")
    import importlib

    mod = importlib.import_module(f"mvs_tpu.cli.{cmd}")
    mod.main(argv)


if __name__ == "__main__":
    main()
