"""Fault-injection filesystem for exercising engine.sources.resilient.

No network exists in this sandbox, so the reference's S3 retry/resume
semantics (warcio.py:164-230) are verified by injecting failures into a
LOCAL filesystem with the same ``open_input_file`` surface.  Lives in the
package (not tests/) so pickled instances import cleanly inside Ray
workers; it has no production role beyond that.
"""

from __future__ import annotations


class FlakyFile:
    """File handle that raises OSError on scheduled read calls."""

    def __init__(self, path, fail_reads, log):
        self._f = open(path, "rb")
        self._fail_reads = fail_reads
        self._log = log

    def seek(self, pos):
        self._log.append(("seek", pos))
        self._f.seek(pos)

    def read(self, n=-1):
        idx = self._log[0]["reads"]
        self._log[0]["reads"] += 1
        if idx in self._fail_reads:
            raise OSError(f"injected read failure #{idx}")
        return self._f.read(n)

    def close(self):
        self._f.close()


class FlakyFS:
    """Local filesystem failing the first ``fail_opens`` opens and the
    read calls whose GLOBAL index is in ``fail_reads``.  State lives on
    the instance, so a pickled copy shipped to a Ray task starts with a
    fresh failure schedule (per-task, like a real per-connection fault).
    ``log[0]`` holds counters; subsequent entries record seeks."""

    def __init__(self, fail_opens=0, fail_reads=()):
        self.fail_opens = fail_opens
        self.fail_reads = frozenset(fail_reads)
        self.log = [{"reads": 0, "opens": 0}]

    def open_input_file(self, path):
        self.log[0]["opens"] += 1
        if self.log[0]["opens"] <= self.fail_opens:
            raise OSError(f"injected open failure #{self.log[0]['opens']}")
        return FlakyFile(path, self.fail_reads, self.log)
