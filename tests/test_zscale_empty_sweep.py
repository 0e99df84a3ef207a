"""Default-on degenerate-input robustness gate over the FULL query
registry: zero-row tables, and a single row of empty strings/arrays (the
nastiest still-legal row — see empty_sweep_subprocess.py).

The sweep subprocess (see empty_sweep_subprocess.py) launches at COLLECTION
time below — pytest imports test modules before running any test, so the
sibling process overlaps the entire suite and the join here is nearly free
(the sweep takes ~4-5 min niced; the suite runs ~5-6).  The "zscale" name
keeps this file LAST in pytest's alphabetical file order so the join happens
after everything else has run.

Targeted runs of other test files never import this module, so the dev loop
(`pytest tests/test_plans.py`) does not pay for the sweep; running this file
alone starts the sweep at its own collection and waits it out.
"""
import json
import os
import subprocess
import sys
import tempfile

from .conftest import SF_DIR

_OUT = os.path.join(
    tempfile.gettempdir(), f"empty_sweep_result_{os.getpid()}.json"
)
_LOG = _OUT.replace(".json", ".log")
# nice +10: the sweep has the whole ~5 min suite to finish ~2 min of work,
# so it runs on cycles the main session isn't using instead of competing
# with the parity chunk's executor threads.
_PROC = subprocess.Popen(
    [
        sys.executable,
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "empty_sweep_subprocess.py"),
        SF_DIR,
        _OUT,
    ],
    stdout=open(_LOG, "w"),
    stderr=subprocess.STDOUT,
    preexec_fn=lambda: os.nice(10),
)


def test_every_query_survives_empty_inputs():
    rc = _PROC.wait(timeout=900)
    tail = ""
    if os.path.exists(_LOG):
        with open(_LOG) as fh:
            tail = fh.read()[-3000:]
    assert rc == 0, f"sweep subprocess rc={rc}\n{tail}"
    with open(_OUT) as fh:
        result = json.load(fh)
    os.unlink(_OUT)
    assert result["n_queries"] >= 2 * 287, result["n_queries"]
    pretty = "\n\n".join(
        f"--- {n}\n{tb[-1200:]}" for n, tb in sorted(result["failures"].items())
    )
    assert not result["failures"], (
        f"{len(result['failures'])} query runs crash on degenerate inputs "
        f"(zero-row tables / a single row of empty strings and arrays — "
        f"routine at 100 TB as fully-filtered shards, tiny post-filter "
        f"strata, and legal-but-empty payloads):\n{pretty}"
    )
