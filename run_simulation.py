#!/usr/bin/env python
"""Simulation CLI — the ``gls-app`` equivalent (reference ``main.cc:1056-1122``):
parses a JSON parameter file (the reference's ``input/*.json`` files work
as-is), echoes it for provenance, runs the time loop, prints the timer
table.

Usage: python run_simulation.py [input.json] [--max-steps N] [--resume]

``--resume`` restarts from the last checkpoint written under the config's
"checkpoint prefix" (new capability vs the reference, SURVEY §5.4).
"""

import argparse
import subprocess
import sys


def git_revision() -> str:
    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, cwd=sys.path[0] or ".",
        ).stdout.strip()
    except Exception:
        return "unknown"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("input", nargs="?", default="")
    ap.add_argument("--max-steps", type=int, default=10**9)
    ap.add_argument("--resume", action="store_true",
                    help="resume from the last checkpoint")
    args = ap.parse_args()

    import os

    import jax

    # honor JAX_PLATFORMS even when a sitecustomize pinned the platform
    # before we ran (env alone is ignored once the plugin registered)
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    print(f"Running: {' '.join(sys.argv)}")
    print(f"  - ns_gls_tpu (revision: {git_revision()})")
    print(f"  - jax {jax.__version__} on {jax.devices()}")
    print()
    if args.input:
        with open(args.input) as f:
            print(f.read())
        print()

    from ns_gls_tpu.config import Parameters
    from ns_gls_tpu.driver import Driver
    from ns_gls_tpu.utils.timer import print_wall_time_statistics

    params = Parameters.from_file(args.input)
    driver = Driver(params)
    driver.run(max_steps=args.max_steps, resume=args.resume)
    print_wall_time_statistics()


if __name__ == "__main__":
    main()
