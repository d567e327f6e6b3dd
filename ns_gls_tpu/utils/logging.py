"""Rank-0-style logging (the ConditionalOStream analogue, ``main.cc:206``).

In a JAX multi-host setting only process 0 prints; single-host runs always
print.  Verbosity is a module switch so tests can silence the driver.
"""

from __future__ import annotations

import sys

_verbose = True


def set_verbose(v: bool):
    global _verbose
    _verbose = v


def get_logger():
    def log(msg: str):
        if not _verbose:
            return
        try:
            import jax

            if jax.process_index() != 0:
                return
        except Exception:
            pass
        print(msg, file=sys.stdout, flush=True)

    return log
