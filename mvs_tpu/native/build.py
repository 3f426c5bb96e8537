"""Build the native core: python -m mvs_tpu.native.build"""

from mvs_tpu.native import build

if __name__ == "__main__":
    ok = build(quiet=False)
    raise SystemExit(0 if ok else 1)
