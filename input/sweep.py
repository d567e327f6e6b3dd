#!/usr/bin/env python
"""Parameter-sweep generator — equivalent of the reference's
``input/input_hoffmann_2D_ReInf.py``: takes a base JSON config and emits
mutated copies over (refinement level, reset-manifold level) for the
roughness study, plus a runner script.

Usage: python input/sweep.py input/hoffmann_2d_reinf.json --levels 2 3 4 \
           --reset-levels -1 0 1 2 --out sweep_out
"""

import argparse
import json
import os
import stat


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("base")
    ap.add_argument("--levels", type=int, nargs="+", default=[2, 3])
    ap.add_argument("--reset-levels", type=int, nargs="+", default=[-1, 0])
    ap.add_argument("--out", default="sweep_out")
    args = ap.parse_args()

    with open(args.base) as f:
        base = json.load(f)

    os.makedirs(args.out, exist_ok=True)
    cmds = []
    counter = 0
    for l in args.levels:
        for r in args.reset_levels:
            cfg = dict(base)
            cfg["n global refinements"] = l
            cfg["simulation reset manifold level"] = r
            cfg["paraview prefix"] = (
                f"{base.get('paraview prefix', 'results')}.{counter:04d}"
            )
            name = os.path.join(args.out, f"input_{counter:04d}.json")
            with open(name, "w") as f:
                json.dump(cfg, f, indent=2)
            cmds.append(f"python run_simulation.py {name}")
            counter += 1

    runner = os.path.join(args.out, "run_all.sh")
    with open(runner, "w") as f:
        f.write("#!/bin/bash\nset -e\n" + "\n".join(cmds) + "\n")
    os.chmod(runner, os.stat(runner).st_mode | stat.S_IEXEC)
    print(f"wrote {counter} configs + {runner}")


if __name__ == "__main__":
    main()
