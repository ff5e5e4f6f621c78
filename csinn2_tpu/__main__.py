"""CLI entry point (ref: the `shl` pip CLI which prints install paths,
python/shl/main.py:22-63) — extended with environment/op-registry info.

Usage: python -m csinn2_tpu [--whereis] [--ops] [--backend]
       python -m csinn2_tpu convert <gguf-or-hf-dir> <out_dir> [--mode q8_0]
"""

import argparse
import os
import sys


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "convert":
        # checkpoint converter subcommand (ref: tests/llm/convert/shl-convert.py)
        from csinn2_tpu.llm.convert import main as convert_main
        return convert_main(sys.argv[2:])
    ap = argparse.ArgumentParser(prog="csinn2_tpu")
    ap.add_argument("--whereis", action="store_true", help="print install path")
    ap.add_argument("--ops", action="store_true", help="list registered ops")
    ap.add_argument("--backend", action="store_true", help="probe jax backend")
    args = ap.parse_args()

    import csinn2_tpu
    root = os.path.dirname(os.path.abspath(csinn2_tpu.__file__))

    if args.whereis:
        print(root)
        return 0
    if args.ops:
        from csinn2_tpu.ops.registry import registry
        for op in registry.ops():
            print(op)
        return 0
    if args.backend:
        from csinn2_tpu.utils.platform import backend_summary, honor_env_platform
        honor_env_platform()
        print(backend_summary())
        return 0

    from csinn2_tpu.ops.registry import registry
    print(f"csinn2_tpu {csinn2_tpu.__version__}")
    print(f"install:    {root}")
    print(f"ops:        {len(registry.ops())} registered")
    print("usage:      python -m csinn2_tpu [--whereis|--ops|--backend]")
    return 0


if __name__ == "__main__":
    sys.exit(main())
