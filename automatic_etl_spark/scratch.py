"""Per-process scratch directories for plan-local staging.

Plan functions stage file-stream inputs, streaming checkpoints, and
write-audit tables under /tmp. A fresh ``tempfile.mkdtemp`` per call
leaked one tree per bench/test invocation — ~1.5 GB and 2,600 entries
of residue after six rounds. ``scratch_dir(name)`` gives each call
site ONE fixed tree per (process tempdir, name), cleared at call
start, so repeated in-session runs and repeated rounds hold exactly
one live instance per site.

Assumptions (same as the session-conf toggles in the streaming plans):
the engine's query functions run single-threaded per process — two
concurrent invocations of the SAME call site would race on the shared
tree. Names must be unique per call site for the same reason.
"""

from __future__ import annotations

import os
import shutil
import tempfile

_ROOT = "spark_graft_scratch"


def scratch_dir(name: str) -> str:
    """A fixed per-(process, name) directory, emptied on every call."""
    base = os.path.join(tempfile.gettempdir(), _ROOT, name)
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)
    return base
