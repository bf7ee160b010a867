"""``remora_tpu`` command line entry point.

Reference analog ``src/remora/main.py`` + ``parsers.py``: five
sub-command groups (dataset, model, infer, validate, analyze). Heavy
modules are imported lazily inside each runner so ``--help`` is fast.
Optional whole-command cProfile via REMORA_TPU_PROFILE_FILE.
"""

import argparse
import os
import sys

from remora_tpu import __version__

_PROFILE_FILE = os.getenv("REMORA_TPU_PROFILE_FILE")


def build_parser():
    parser = argparse.ArgumentParser(
        prog="remora_tpu",
        description="TPU-native modified-base calling framework",
    )
    parser.add_argument(
        "--version", action="version", version=f"remora_tpu {__version__}"
    )
    subparsers = parser.add_subparsers(dest="command", title="commands")

    from remora_tpu.cli import parsers

    parsers.register_dataset(subparsers)
    parsers.register_model(subparsers)
    parsers.register_infer(subparsers)
    parsers.register_validate(subparsers)
    parsers.register_analyze(subparsers)
    return parser


def run():
    # honor JAX_PLATFORMS before any runner imports jax: plugin TPU
    # backends (e.g. tunneled chips) ignore the plain environment
    # variable, so JAX_PLATFORMS=cpu would otherwise silently still
    # dispatch to the TPU
    from remora_tpu.jax_setup import honor_platform_env

    honor_platform_env()

    parser = build_parser()
    args = parser.parse_args()
    if not hasattr(args, "func"):
        parser.print_help()
        sys.exit(1)
    if _PROFILE_FILE:
        import cProfile

        prof = cProfile.Profile()
        try:
            prof.runcall(args.func, args)
        finally:
            prof.dump_stats(_PROFILE_FILE)
    else:
        args.func(args)


if __name__ == "__main__":
    run()
