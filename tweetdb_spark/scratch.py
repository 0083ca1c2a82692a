"""Per-process scratch-dir management for operators that stage data in
the system temp dir (compaction rewrites, streaming sink/checkpoint
dirs).

Dirs are namespaced ``<prefix>_<pid-tag>_<time_ns>`` so that

- concurrent sessions (e.g. ``tools/check.py`` and ``pytest`` at the
  same time) can never reap each other's in-flight output or
  checkpoint dirs — each process only ever deletes dirs carrying its
  OWN pid tag;
- within one process, the fixed-width ``time_ns`` suffix keeps
  lexicographic order == creation order, which the layout tests rely
  on to find the latest dir;
- a crashed process's leftovers are reclaimed lazily: any dir whose
  tag is NOT a live pid and whose mtime is older than ``_REAP_AGE_S``
  is fair game for whoever runs next.
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile
import time

TAG = f"p{os.getpid()}"
_REAP_AGE_S = 2 * 3600  # only reap foreign dirs this stale

# Per-session namespacing for caches and scratch prefixes.  id() of a
# JVM handle alone is unsafe as a cache key (reusable after GC), and a
# bare pid prefix lets two live sessions in one process reap/repoint
# each other's index dirs.  The token pins the JVM handle in the value
# (so its id can never be recycled while the entry exists — same trick
# as catalog._CACHE) and is unique per session, so including it in a
# dir prefix or table name isolates concurrent sessions completely.
_SESSION_TOKENS: dict[int, tuple[object, str]] = {}


def session_token(spark) -> str:
    """Stable, process-unique 8-hex token for this SparkSession."""
    import uuid

    j = spark._jsparkSession
    ent = _SESSION_TOKENS.get(id(j))
    if ent is None:
        ent = (j, uuid.uuid4().hex[:8])
        _SESSION_TOKENS[id(j)] = ent
    return ent[1]


def _is_live_pid(tag: str) -> bool:
    if not tag.startswith("p") or not tag[1:].isdigit():
        return False  # pre-namespacing legacy dir: treat as not live
    try:
        os.kill(int(tag[1:]), 0)
        return True
    except (ProcessLookupError, ValueError):
        return False
    except PermissionError:
        return True  # exists, owned by someone else


def reap_stale(base_dir: str, prefix: str) -> None:
    """Remove ``base_dir/<prefix>_*`` dirs owned by this process, plus
    long-dead foreign ones (same policy as ``fresh_dir``, any base)."""
    now = time.time()
    for stale in glob.glob(os.path.join(base_dir, f"{prefix}_*")):
        parts = os.path.basename(stale)[len(prefix) + 1 :].split("_", 1)
        tag = parts[0] if parts else ""
        ours = tag == TAG
        try:
            abandoned = (
                not ours
                and not _is_live_pid(tag)
                and now - os.path.getmtime(stale) > _REAP_AGE_S
            )
        except OSError:
            abandoned = False
        if ours or abandoned:
            shutil.rmtree(stale, ignore_errors=True)


def fresh_dir(prefix: str) -> str:
    """Reap this process's stale ``prefix`` dirs (plus long-dead foreign
    ones) and return a new unique ``prefix`` path (not yet created —
    Spark writers create it)."""
    reap_stale(tempfile.gettempdir(), prefix)
    return os.path.join(
        tempfile.gettempdir(), f"{prefix}_{TAG}_{time.time_ns()}"
    )


def own_dirs(prefix: str) -> list[str]:
    """This process's ``prefix`` dirs, lexicographically sorted (== by
    creation order).  Used by layout tests to find the latest one."""
    return sorted(
        glob.glob(os.path.join(tempfile.gettempdir(), f"{prefix}_{TAG}_*"))
    )
