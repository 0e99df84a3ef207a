"""Join point for the pooled-scenarios sibling process (see
scenarios_sibling_subprocess.py — txn ACID scenarios + ext pooled checks
+ ext planted pool).  Launched by conftest's
``pytest_collection_finish`` when this test survives selection, so the
pools overlap the whole suite; the "z" prefix sorts the wait near the
end where it is nearly free.

Targeted run: ``pytest tests/test_z_scenarios_join.py`` (launches the
sibling at its own collection-finish and waits it out).
"""
import atexit
import json
import os
import subprocess
import sys
import tempfile

from .conftest import SF_DIR

_OUT = os.path.join(tempfile.gettempdir(), f"scen_result_{os.getpid()}.json")
_LOG = _OUT.replace(".json", ".log")
_PROC: subprocess.Popen | None = None
_LOG_FH = None


def launch() -> subprocess.Popen:
    """Start the scenarios sibling (idempotent)."""
    global _PROC, _LOG_FH
    if _PROC is not None:
        return _PROC
    _LOG_FH = open(_LOG, "w")
    # nice +2, same stance as the parity sibling: the suite's correctness
    # verdict waits on this work, so keep it close to parity with the
    # main process rather than pure-insurance nice+10.
    _PROC = subprocess.Popen(
        [
            sys.executable,
            os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "scenarios_sibling_subprocess.py",
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


def test_pooled_scenarios_from_sibling():
    rc = launch().wait(timeout=900)
    _LOG_FH.close()
    tail = ""
    if os.path.exists(_LOG):
        with open(_LOG) as fh:
            tail = fh.read()[-3000:]
    assert rc == 0, f"scenarios sibling rc={rc}\n{tail}"
    with open(_OUT) as fh:
        result = json.load(fh)
    os.unlink(_OUT)
    if os.path.exists(_LOG):
        os.unlink(_LOG)  # keep /tmp tidy on success; failures return above
    assert not result["problems"], (
        f"{len(result['problems'])} pooled scenarios failed in the sibling:\n"
        + "\n\n".join(result["problems"])
    )
