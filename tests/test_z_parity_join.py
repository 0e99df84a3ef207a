"""Join point for the oracle-parity sibling process (see
parity_sibling_subprocess.py).  The sibling is launched by conftest's
``pytest_collection_finish`` when this test survives selection, so it
overlaps the whole suite; the "z" prefix sorts this file near the end
(just before test_zscale_empty_sweep's sweep join) so the wait here is
nearly free.

Targeted full-parity run: ``pytest tests/test_z_parity_join.py`` (launches
the sibling at its own collection-finish and waits it out).  Single-query
dev loop: ``PARITY_ONLY=name pytest tests/test_oracle_parity.py -k only``.
"""
import atexit
import json
import os
import subprocess
import sys
import tempfile

from .conftest import SF_DIR

_OUT = os.path.join(
    tempfile.gettempdir(), f"parity_result_{os.getpid()}.json"
)
_LOG = _OUT.replace(".json", ".log")
_PROC: subprocess.Popen | None = None
_LOG_FH = None


def launch() -> subprocess.Popen:
    """Start the parity sibling (idempotent).  Called from
    conftest.pytest_collection_finish when this module's test is selected,
    or lazily by the test itself as a fallback."""
    global _PROC, _LOG_FH
    if _PROC is not None:
        return _PROC
    _LOG_FH = open(_LOG, "w")
    # nice +2: slightly favor the main suite's executor threads, but keep
    # the parity sweep close to parity — unlike the nice+10 degenerate
    # sweep it is not pure insurance; the suite's correctness verdict
    # waits on it.
    _PROC = subprocess.Popen(
        [
            sys.executable,
            os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "parity_sibling_subprocess.py",
            ),
            SF_DIR,
            _OUT,
        ],
        stdout=_LOG_FH,
        stderr=subprocess.STDOUT,
        preexec_fn=lambda: os.nice(2),
    )
    return _PROC


def _cleanup() -> None:
    if _PROC is not None and _PROC.poll() is None:
        _PROC.terminate()
        try:
            _PROC.wait(timeout=10)
        except subprocess.TimeoutExpired:
            _PROC.kill()
    if _LOG_FH is not None and not _LOG_FH.closed:
        _LOG_FH.close()


atexit.register(_cleanup)


def test_all_queries_match_oracle():
    rc = launch().wait(timeout=900)
    _LOG_FH.close()
    tail = ""
    if os.path.exists(_LOG):
        with open(_LOG) as fh:
            tail = fh.read()[-3000:]
    assert rc == 0, f"parity sibling rc={rc}\n{tail}"
    with open(_OUT) as fh:
        result = json.load(fh)
    os.unlink(_OUT)
    if os.path.exists(_LOG):
        os.unlink(_LOG)  # keep /tmp tidy on success; failures return above
    assert result["n_queries"] == result["n_expected"], result
    assert not result["problems"], (
        f"{len(result['problems'])} queries diverge from the DuckDB oracle "
        f"or fail the plan scale-audit:\n" + "\n".join(result["problems"])
    )
