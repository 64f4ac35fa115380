"""fd-level stdout/stderr capture.

Parity target: the reference's redirector.py [SURVEY §2.1 C6] — dup2-based
capture of C-level output so native-solver prints don't flood training logs.
Used around the C++ labeling solver here.
"""
from __future__ import annotations

import os
import sys
from contextlib import contextmanager


@contextmanager
def redirect_fd(fd: int = 1, to: str = os.devnull):
    """Redirect a raw file descriptor (1=stdout, 2=stderr) at the OS level,
    capturing output from C extensions as well as Python."""
    stream = sys.stdout if fd == 1 else sys.stderr
    stream.flush()
    saved = os.dup(fd)
    try:
        with open(to, "wb") as target:
            os.dup2(target.fileno(), fd)
        yield
    finally:
        stream.flush()
        os.dup2(saved, fd)
        os.close(saved)


@contextmanager
def capture_fd(fd: int = 1):
    """Capture fd output into a returned buffer: `with capture_fd() as get: ...;
    text = get()`."""
    import tempfile
    stream = sys.stdout if fd == 1 else sys.stderr
    stream.flush()
    saved = os.dup(fd)
    tmp = tempfile.TemporaryFile()
    result = {}
    try:
        os.dup2(tmp.fileno(), fd)
        yield lambda: result.get("text", "")
    finally:
        stream.flush()
        os.dup2(saved, fd)
        os.close(saved)
        tmp.seek(0)
        result["text"] = tmp.read().decode(errors="replace")
        tmp.close()
